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
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SUBONT_SHUFFLE_PARTITIONS", str(max(cores, 8))))
    aqe = os.environ.get("SUBONT_AQE", "true")  # AQE off is faster for
    # tiny-fixture sessions (per-job re-planning dominates µ-batches)
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
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
