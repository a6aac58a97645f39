"""Multimodal binary plumbing + streaming ingestion tests."""

import pyspark.sql.functions as F
import pytest

from subont.corpus import synth_corpus
from subont.multimodal import (
    extract_media_features,
    partition_media,
    sample_video_frames,
    synth_media,
)
from subont.streaming import read_corpus_stream, run_statement_sink


def test_media_features_fake_decode(spark):
    media = synth_media(spark, 200)
    feats = extract_media_features(partition_media(media, buckets=8), dim=8, fake=True)
    rows = feats.collect()
    assert len(rows) == 200
    assert all(len(r.feature) == 8 for r in rows)
    assert all(len(r.sha256) == 64 for r in rows)
    # deterministic: same payload → same feature on a rerun
    again = {r.media_id: r.feature for r in extract_media_features(media, dim=8, fake=True).collect()}
    assert all(again[r.media_id] == r.feature for r in rows)


def test_partition_media_colocates_similar_sizes(spark):
    """log2-width size buckets: payloads of the same magnitude land in
    the SAME partition; a payload 100× larger lands elsewhere (unless
    the hash collides the two buckets, which these sizes don't)."""
    rows = [
        (1, "image", bytes(1000)),
        (2, "image", bytes(600)),    # same log2 bucket [512, 1023]
        (3, "image", bytes(1023)),   # same log2 bucket
        (4, "image", bytes(150_000)),  # far bucket
    ]
    df = spark.createDataFrame(rows, "media_id long, modality string, payload binary")
    parted = partition_media(df, buckets=16).withColumn(
        "pid", F.spark_partition_id()
    )
    pids = {r.media_id: r.pid for r in parted.select("media_id", "pid").collect()}
    assert pids[1] == pids[2] == pids[3]
    assert pids[4] != pids[1]


def test_media_decode_stub_raises(spark):
    media = synth_media(spark, 5)
    with pytest.raises(Exception) as ei:
        extract_media_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_video_frame_sampling_plan(spark):
    media = synth_media(spark, 100)
    frames = sample_video_frames(media, every_ms=10000)
    joined = frames.join(media.select("media_id", "duration_ms"), "media_id")
    bad = joined.filter(
        (F.col("frame_ts_ms") < 0) | (F.col("frame_ts_ms") >= F.col("duration_ms"))
    )
    assert bad.isEmpty()
    assert frames.count() > 0


def test_streaming_statement_sink(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    cp_dir = str(tmp_path / "cp")
    corpus = synth_corpus(spark, n_files=200, n_concepts=30)
    corpus.write.mode("overwrite").parquet(src_dir)

    run_statement_sink(spark, src_dir, out_dir, cp_dir)
    streamed = spark.read.parquet(out_dir)

    from subont.extract import extract_statements

    batch = extract_statements(spark.read.parquet(src_dir))
    key = ["repo", "path", "stype", "arg1", "arg2"]
    assert streamed.count() == batch.count()
    assert streamed.select(*key).exceptAll(batch.select(*key)).isEmpty()

    # restart with no new data: exactly-once, nothing duplicated
    run_statement_sink(spark, src_dir, out_dir, cp_dir)
    assert spark.read.parquet(out_dir).count() == batch.count()


def test_stream_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState gap sessionization: sessions closed by a
    later event are emitted; state carries the open session across
    micro-batches (maxFilesPerTrigger=1 forces two batches)."""
    from datetime import datetime, timedelta

    from subont.streaming import stream_sessionize

    t0 = datetime(2024, 1, 1, 8, 0, 0)
    m = timedelta(minutes=1)
    src = tmp_path / "events_stream"
    src.mkdir()
    # batch 1: user 1 session A (3 events), user 2 session A (1 event)
    spark.createDataFrame(
        [(1, t0), (1, t0 + 5 * m), (1, t0 + 10 * m), (2, t0)],
        "user_id long, ts timestamp",
    ).coalesce(1).write.parquet(str(src / "b1"))
    # batch 2 (later files): events >30min after close both session As
    spark.createDataFrame(
        [(1, t0 + 60 * m), (2, t0 + 120 * m), (2, t0 + 125 * m)],
        "user_id long, ts timestamp",
    ).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = str(tmp_path / "sessions_out")
    q = (
        stream_sessionize(stream, gap_minutes=30)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    # only the sessions CLOSED by a later event are emitted; the trailing
    # open sessions (user1 @t0+60m, user2 @t0+120m..125m) stay in state
    assert got == {
        (1, t0, t0 + 10 * m, 3),
        (2, t0, t0, 1),
    }
