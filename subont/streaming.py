"""Structured Streaming ingestion of the corpus (incremental KG build).

The reference is a pure batch pipeline (SURVEY.md §2.6: no streaming);
this module is the engine's forward path for continuously-arriving
repositories: ``readStream`` over the corpus table directory →
the SAME extraction logic (subont.extract) → append-mode statement sink,
with an event-time watermark + windowed per-repo statement counts as the
monitoring rollup.  The batch pipeline then folds new statement
partitions in via its checkpointed stages (subont.lineage).

foreachBatch is deliberately avoided for extraction: mapInPandas works
unchanged under streaming, keeping one code path for batch and stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import STATEMENT_SCHEMA, extract_statements

CORPUS_DDL = (
    "repo string, path string, commit string, lang string, content string, sha256 string"
)


def read_corpus_stream(spark: SparkSession, src_dir: str, max_files: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(CORPUS_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(src_dir)
    )


def stream_statements(src_stream: DataFrame) -> DataFrame:
    """Extraction works identically on a streaming DataFrame."""
    return extract_statements(src_stream)


def stream_statement_counts(src_stream: DataFrame, window: str = "1 minute") -> DataFrame:
    """Watermarked per-repo/stype rollup for pipeline monitoring."""
    stmts = extract_statements(src_stream).withColumn("ts", F.current_timestamp())
    return (
        stmts.withWatermark("ts", "2 minutes")
        .groupBy(F.window("ts", window).alias("w"), "repo", "stype")
        .agg(F.count("*").alias("n"))
    )


SESSION_OUTPUT_DDL = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
SESSION_STATE_DDL = "last_ts timestamp, start_ts timestamp, n long"


def _make_gap_split():
    # factory-made (<locals> qualname) → cloudpickle serializes the
    # kernel BY VALUE into the applyInPandasWithState closure, so the
    # streaming executors never need the subont package importable
    def gap_split(ts, state, gap_seconds):
        """Pure per-key sessionization kernel (vectorized pandas).

        ts: unsorted pandas Series of event timestamps for ONE key;
        state: (last_ts, start_ts, n) of the open session or (None, None, 0);
        returns (closed, new_state) where closed = [(start, end, n), ...].

        Late events at or before the open session's last_ts are absorbed
        into the open session's count but never rewind it (sessions already
        closed are immutable — the watermark-style policy)."""
        import pandas as pd

        last_ts, start_ts, n = state
        closed = []
        ts = ts.sort_values(ignore_index=True)
        if last_ts is not None:
            late = ts <= pd.Timestamp(last_ts)
            n += int(late.sum())
            ts = ts[~late].reset_index(drop=True)
        if len(ts):
            gaps = ts.diff().dt.total_seconds()
            new_sess = gaps > gap_seconds
            if last_ts is not None:
                new_sess.iloc[0] = (
                    ts.iloc[0] - pd.Timestamp(last_ts)
                ).total_seconds() > gap_seconds
            grp = new_sess.cumsum()
            agg = (
                pd.DataFrame({"ts": ts, "grp": grp})
                .groupby("grp")["ts"]
                .agg(["min", "max", "count"])
                .reset_index(drop=True)
            )
            starts = list(agg["min"])
            ends = list(agg["max"])
            counts = [int(c) for c in agg["count"]]
            if bool(new_sess.iloc[0]):  # False when last_ts is None (NaN gap)
                # gap right at the batch boundary: the open session closes
                # with no new events, group 0 starts a fresh session
                closed.append((start_ts, last_ts, n))
                start_ts, n = None, 0
            if start_ts is not None:  # group 0 continues the open session
                starts[0] = start_ts
            counts[0] += n
            closed.extend((starts[i], ends[i], counts[i]) for i in range(len(starts) - 1))
            start_ts, last_ts, n = starts[-1], ends[-1], counts[-1]
        return closed, (last_ts, start_ts, n)

    return gap_split


gap_split = _make_gap_split()


def stream_sessionize(events_stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization with
    ``applyInPandasWithState`` — the streaming twin of the batch
    Q_SESSIONIZE window query.

    Per user, events extend the open session while the inter-event gap
    stays ≤ ``gap_minutes``; a longer gap CLOSES the session (emitted
    downstream) and opens a new one.  The trailing open session stays in
    state across micro-batches (exactly-once via the stream checkpoint).

    Ordering: applyInPandasWithState gives NO ordering across Arrow
    chunks, so all of a key's chunks are concatenated and sorted once
    before the gap split.  Across micro-batches, an event older than the
    open session's last_ts (late arrival past the state boundary) is
    absorbed into the open session's count but never rewinds last_ts —
    sessions already closed are immutable, the watermark-style policy.

    Scale shape: state is per-user O(1) (three scalars); the per-batch
    gap split is vectorized pandas (sort + diff + cumsum), no per-row
    Python loop; the shuffle partitions by user_id like any streaming
    aggregation."""
    import pandas as pd  # noqa: F401 (executor import)

    gap_seconds = gap_minutes * 60

    def fn(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        cur = state.get if state.exists else (None, None, 0)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        ts = (
            pd.concat(chunks, ignore_index=True)["ts"]
            if chunks
            else pd.Series([], dtype="datetime64[us]")
        )
        closed, cur = gap_split(ts, cur, gap_seconds)
        state.update(cur)
        if closed:
            yield pd.DataFrame(
                [(user_id, s, e, c) for s, e, c in closed],
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_DDL,
        stateStructType=SESSION_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_statement_sink(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Append-mode statement sink; restart-safe via the stream checkpoint
    (exactly-once file sink semantics)."""
    q = (
        stream_statements(read_corpus_stream(spark, src_dir))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
