"""SparkSession factory with scale-oriented defaults.

Defaults target correctness tests on local[*]; the same settings are the
ones we would ship to a 1000-executor cluster (AQE on, skew-join on,
Arrow on). ``shuffle_partitions`` is deliberately small for the tiny
fixture tables — at 100 TB this is sized per-stage via AQE coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "subont",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    max_partition_bytes: int | None = None,
) -> SparkSession:
    """``max_partition_bytes``: input-split size for file scans.  The
    Spark default (128 MB) packs a few-hundred-MB corpus into 2-3 scan
    partitions — the stage that feeds the Arrow extraction UDF then runs
    2-3 tasks no matter how many cores the session has.  Size it so the
    scan yields ≥ cores splits (at 100 TB the default is fine; at bench
    scale pass a few MB)."""
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SUBONT_SHUFFLE_PARTITIONS", str(max(cores, 8))))
    if max_partition_bytes is None:
        mpb = os.environ.get("SUBONT_MAX_PARTITION_BYTES")
        max_partition_bytes = int(mpb) if mpb else None
    aqe = os.environ.get("SUBONT_AQE", "true")  # AQE stays ON even at
    # fixture scale: the round-3 controlled A/B (BENCH.md) measured
    # AQE-off at 2.7× slower (61 jobs / 328s) — runtime broadcast-join
    # conversion dominates the per-stage scheduling overhead
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SUBONT_DRIVER_MEM", "8g"))
        # local mode: the driver JVM hosts every executor thread, so JVM
        # tuning goes here (e.g. the GCLocker retry bump for JDK-8192647
        # spurious OOMs under Arrow/Netty JNI critical sections — set by
        # the stress harness); empty by default
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SUBONT_DRIVER_JAVA_OPTS", ""),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if max_partition_bytes:
        builder = builder.config(
            "spark.sql.files.maxPartitionBytes", str(max_partition_bytes)
        ).config("spark.sql.files.openCostInBytes", str(max(max_partition_bytes // 8, 65536)))
    return builder.getOrCreate()
