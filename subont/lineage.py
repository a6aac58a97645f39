"""Stage checkpointing with per-partition lineage + metrics (north rule).

Every pipeline stage writes its output to ``<workdir>/<stage>/data``
(parquet) together with:

* ``_lineage``  — one row per output partition: partition id, row count,
                  content checksum (xxhash-sum) — enough to audit which
                  partition produced what and to diff reruns;
* ``_metrics.json`` — rows, partitions, wall seconds, input stage names.

``StageRunner.run`` is the resume point: if the stage directory has a
``_SUCCESS`` marker, the stage is **skipped** and its stored output is
returned — so a killed pipeline restarts from the last completed stage.
All ids in this engine are content hashes (model.py, canon.py), so
recomputed stages are bit-identical to resumed ones.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageRunner:
    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.log: list[dict] = []

    def _dir(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def is_done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._dir(stage), "data", "_SUCCESS"))

    def run(self, stage: str, fn, inputs: list[str] | None = None) -> DataFrame:
        """Compute-or-resume one stage; fn() -> DataFrame."""
        d = self._dir(stage)
        data_dir = os.path.join(d, "data")
        if self.is_done(stage):
            self.log.append({"stage": stage, "resumed": True})
            return self.spark.read.parquet(data_dir)
        t0 = time.time()
        df = fn()
        df.write.mode("overwrite").parquet(data_dir)
        out = self.spark.read.parquet(data_dir)
        m = F.lit(1 << 40)
        cols = out.columns
        lineage = (
            out.withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid")
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.pmod(F.xxhash64(*cols), m)).alias("checksum"),
            )
            .withColumnRenamed("__pid", "partition_id")
        )
        lineage.write.mode("overwrite").parquet(os.path.join(d, "_lineage"))
        n = out.count()
        metrics = {
            "stage": stage,
            "rows": n,
            "partitions": out.rdd.getNumPartitions(),
            "wall_sec": round(time.time() - t0, 3),
            "inputs": inputs or [],
            "resumed": False,
        }
        with open(os.path.join(d, "_metrics.json"), "w") as f:
            json.dump(metrics, f)
        self.log.append(metrics)
        return out

    def metrics(self) -> list[dict]:
        out = []
        for stage in sorted(os.listdir(self.workdir)):
            p = os.path.join(self.workdir, stage, "_metrics.json")
            if os.path.exists(p):
                with open(p) as f:
                    out.append(json.load(f))
        return out
