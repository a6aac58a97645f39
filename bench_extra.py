#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1): per-query wall,
Spark job counts, noop-sink isolation, and .explain("formatted") dumps.

NOT the frozen driver bench — see bench.py for the measured protocol.

Usage:
  python bench_extra.py                    # profile headline queries
  python bench_extra.py --queries kg_corpus_triples --samples 3
  python bench_extra.py --plans plans/r06 --suffix before   # dump plans
  python bench_extra.py --all              # profile all 36 declared queries
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

from bench import HEADLINE, _session  # noqa: E402


def _job_count(sc, group: str) -> int:
    try:
        return len(sc.statusTracker().getJobIdsForGroup(group))
    except Exception:
        return -1


def profile(sf_dir: str, cores: int, names: list[str], samples: int, noop: bool) -> dict:
    import __spark_entry__ as em

    spark = _session(cores, shuffle=max(cores, 16))
    spark.range(10).count()
    qs = em.queries()
    out: dict[str, dict] = {}
    for name in names:
        best = None
        jobs = -1
        for i in range(samples):
            group = f"{name}#{i}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            dt = round(time.time() - t0, 3)
            spark.sparkContext.setJobGroup("", "")
            j = _job_count(spark.sparkContext, group)
            if best is None or dt < best:
                best, jobs = dt, j
            spark.catalog.clearCache()
            try:
                jmap = spark.sparkContext._jsc.getPersistentRDDs()
                for rdd_id in list(jmap.keySet().toArray()):
                    spark.sparkContext._jsc.sc().unpersistRDD(int(str(rdd_id)), False)
            except Exception:
                pass
        out[name] = {"sec": best, "jobs": jobs, "rows": n}
        print(f"{name}: {best}s jobs={jobs} rows={n}", file=sys.stderr)
    spark.stop()
    return out


def dump_plans(sf_dir: str, cores: int, names: list[str], plans_dir: str, suffix: str) -> None:
    import __spark_entry__ as em

    spark = _session(cores, shuffle=max(cores, 16))
    qs = em.queries()
    os.makedirs(plans_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plans", default=None, help="dump explain(formatted) to this dir")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()
    import __spark_entry__ as em

    if args.all:
        names = list(em.queries())
    else:
        names = args.queries or HEADLINE
    if args.plans:
        dump_plans(args.sf_dir, args.cpus, names, args.plans, args.suffix)
        return
    out = profile(args.sf_dir, args.cpus, names, args.samples, args.noop)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
