#!/usr/bin/env python
"""SNOMED-scale classification stress run (VERDICT r3 item 3).

Generates the seeded synthetic ontology at the reference's production
scale (~360k concepts, ~1M axiom rows incl. reified PV equivalences —
README.md:60 sizes the reference's JVM for exactly this input), then
drives the two reference workloads:

* ``classify`` — full EL classification, reporting closure size,
  fixpoint round count and wall time;
* ``compute_subontology`` — a focus-subset extraction over the result
  (optional, ``--extract``).

Usage:
  python stress_ontology.py [--n 360000] [--cores 32] [--seed 0]
                            [--naive-check-n 2000] [--extract]

``--naive-check-n``: first classifies a small same-seed sample and
asserts the semi-naive closure equals the brute-force (naive=True)
fixpoint — the correctness gate for the big run's machinery.

Prints ONE JSON line with the measured numbers (BENCH.md records them).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> int:
    # local[32] packs every executor thread into ONE JVM, so the heap
    # must hold the 63M-row closure's shuffle blocks for all 32 tasks at
    # once — 8g (the test default) is borderline there (GC-locker
    # retries, occasional OOM).  On a real cluster this is per-executor
    # memory, sized by spark-submit; here the stress harness defaults
    # higher and stays overridable.
    os.environ.setdefault("SUBONT_DRIVER_MEM", "28g")
    # JDK-8192647: allocation can spuriously OOM when JNI critical
    # sections (Arrow / Netty) keep blocking the GC — observed as
    # "Retried waiting for GCLocker too often" storms right before a
    # heap-space OOM with plenty of heap free.  Raise the retry count.
    os.environ.setdefault(
        "SUBONT_DRIVER_JAVA_OPTS",
        "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=128",
    )
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=360_000)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--naive-check-n", type=int, default=2_000)
    ap.add_argument("--extract", action="store_true")
    ap.add_argument("--focus", type=int, default=500, help="focus concepts for --extract")
    ap.add_argument(
        "--durable",
        metavar="DIR",
        default=None,
        help="route every fixpoint checkpoint through RELIABLE "
        "df.checkpoint() files under DIR (SUBONT_CHECKPOINT_DIR), then "
        "after classify drop EVERY in-memory block (executor-loss proxy "
        "— would kill a localCheckpoint-backed plan) and re-count the "
        "closure from the durable round files (VERDICT r4 item 6)",
    )
    ap.add_argument(
        "--rf2",
        metavar="DIR",
        default=None,
        help="after --extract, materialize the RF2 relationship sinks "
        "(P14 NNF→triples + P15 two-phase Verhoeff SCTID numbering + S8 "
        "file writes) into DIR — the only pipeline stages never before "
        "exercised at stress scale (VERDICT r4 item 2)",
    )
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from subont.closure import classify
    from subont.session import get_spark
    from subont.synth import synthetic_ontology

    spark = get_spark("subont-stress", cores=args.cores,
                      shuffle_partitions=max(args.cores * 2, 32))
    out: dict = {"n_concepts": args.n, "seed": args.seed, "cores": args.cores}

    if args.naive_check_n:
        ont_s = synthetic_ontology(spark, n_concepts=args.naive_check_n, seed=args.seed)
        # the check gates the BIG run's machinery: force the distributed
        # semi-naive path (the local kernel would otherwise take over at
        # this sample size; it has its own equivalence gates in pytest)
        os.environ["SUBONT_LOCAL_CLASSIFY"] = "off"
        try:
            fast = classify(ont_s)
        finally:
            del os.environ["SUBONT_LOCAL_CLASSIFY"]
        slow = classify(ont_s, naive=True)
        d1 = fast.closure.exceptAll(slow.closure).count()
        d2 = slow.closure.exceptAll(fast.closure).count()
        assert d1 == 0 and d2 == 0, (d1, d2)
        out["naive_check"] = f"ok@{args.naive_check_n}"

    if args.durable:
        os.environ["SUBONT_CHECKPOINT_DIR"] = args.durable

    ont = synthetic_ontology(spark, n_concepts=args.n, seed=args.seed)
    out["axiom_rows"] = ont.axioms.count()
    out["pv_rows"] = ont.pvs.count()

    t0 = time.time()
    cl = classify(ont, max_fixpoint_rounds=24, progress=True)
    t_cnt = time.time()
    out["closure_rows"] = cl.closure.count()
    out["closure_count_sec"] = round(time.time() - t_cnt, 1)
    out["classify_sec"] = round(time.time() - t0, 1)
    t1 = time.time()
    out["direct_rows"] = cl.direct.count()
    out["direct_sec"] = round(time.time() - t1, 1)

    if args.durable:
        # executor-loss proxy at scale: drop EVERY persisted block, then
        # the closure must be re-countable purely from the reliable
        # round files (a localCheckpoint plan dies here — its truncated
        # lineage cannot recompute lost blocks)
        t = time.time()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(True)
        spark.catalog.clearCache()
        n2 = cl.closure.count()
        assert n2 == out["closure_rows"], (n2, out["closure_rows"])
        out["durable_resume_rows"] = n2
        out["durable_resume_sec"] = round(time.time() - t, 1)

    if args.extract:
        from subont.pipeline import compute_subontology

        focus = (
            spark.range(2, args.n * 4 // 5)
            .select(F.col("id").alias("concept_id"))
            .filter((F.col("concept_id") % ((args.n * 4 // 5) // args.focus)) == 3)
        )
        out["focus_n"] = focus.count()
        t2 = time.time()
        # compute_rf2=False: the synthetic id space has no SNOMED
        # metadata concepts to fold into the focus set; src_cl reuses
        # the already-computed source classification (the reference
        # re-classifies from scratch — SubOntologyExtractionHandler.java:186)
        res = compute_subontology(spark, ont, focus, compute_rf2=False, src_cl=cl)
        out["sub_axioms"] = res.sub.axioms.count()
        out["nnf_rows"] = res.nnf_rows.count()
        out["extract_sec"] = round(time.time() - t2, 1)

        if args.rf2:
            from subont.rf2 import (
                relationship_rf2_files,
                triples_from_nnf,
                write_rf2_named,
            )

            t3 = time.time()
            triples = triples_from_nnf(res.nnf_rows, res.prop_defs, res.sub)
            standard, concrete = relationship_rf2_files(triples)
            p_std = write_rf2_named(
                standard, args.rf2, "sct2_Relationship_Snapshot_INT_00000000.txt"
            )
            p_cv = write_rf2_named(
                concrete,
                args.rf2,
                "sct2_RelationshipConcreteValues_Snapshot_INT_00000000.txt",
            )
            out["rf2_sec"] = round(time.time() - t3, 1)
            with open(p_std) as f:
                out["rf2_standard_rows"] = sum(1 for _ in f) - 1
            with open(p_cv) as f:
                out["rf2_concrete_rows"] = sum(1 for _ in f) - 1

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
