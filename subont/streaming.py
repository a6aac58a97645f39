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
