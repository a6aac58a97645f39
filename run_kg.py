#!/usr/bin/env python
"""Corpus → knowledge-graph triples, cluster entry point (north rule).

    zip -r subont.zip subont
    spark-submit --py-files subont.zip run_kg.py \
        --input  <parquet/iceberg path with (repo,path,commit,lang,content,sha256)> \
        --workdir <checkpoint dir (resume point)> \
        --output  <triples parquet path>

Verifies the per-row sha256 invariant at ingest, runs the resumable
pipeline (subont.kg.build_kg_resumable), writes triples + per-stage
metrics.  Re-running after a crash resumes from the last completed
stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-score", type=float, default=0.5)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--skip-sha-check", action="store_true")
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from subont.kg import build_kg_resumable
    from subont.session import get_spark

    t0 = time.time()
    spark = get_spark("subont-kg", cores=args.cores)
    src = spark.read.parquet(args.input)

    if not args.skip_sha_check:
        bad = src.filter(F.sha2(F.col("content"), 256) != F.col("sha256")).count()
        if bad:
            print(f"sha256 invariant violated on {bad} rows — aborting")
            return 2

    triples, runner = build_kg_resumable(spark, src, args.workdir, min_score=args.min_score)
    triples.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    dt = time.time() - t0
    print(json.dumps({
        "triples": n,
        "wall_sec": round(dt, 2),
        "triples_per_sec": round(n / dt, 1),
        "stages": runner.log,  # this run's view: resumed stages flagged
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
