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
