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


def stream_sessionize(events_stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization with
    ``applyInPandasWithState`` — the streaming twin of the batch
    Q_SESSIONIZE window query.

    Per user, events extend the open session while the inter-event gap
    stays ≤ ``gap_minutes``; a longer gap CLOSES the session (emitted
    downstream) and opens a new one.  The trailing open session stays in
    state across micro-batches (exactly-once via the stream checkpoint).

    Scale shape: state is per-user O(1) (three scalars); the shuffle
    partitions by user_id like any streaming aggregation."""
    import pandas as pd  # noqa: F401 (executor import)

    gap_seconds = gap_minutes * 60

    def fn(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_ts, start_ts, n = state.get
        else:
            last_ts = start_ts = None
            n = 0
        closed = []
        for pdf in pdfs:
            for ts in pdf.sort_values("ts")["ts"]:
                ts = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
                if last_ts is not None and (ts - last_ts).total_seconds() > gap_seconds:
                    closed.append((user_id, start_ts, last_ts, n))
                    start_ts, n = None, 0
                if start_ts is None:
                    start_ts = ts
                last_ts = ts
                n += 1
        state.update((last_ts, start_ts, n))
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "session_start", "session_end", "n_events"]
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
