"""Shared checkpoint helpers.

Two modes behind one seam:

* default — ``localCheckpoint(eager=False)``: lineage truncation with
  blocks in executor memory/disk.  Fastest for bench/fixture latency,
  but NOT recoverable after an executor loss.
* durable — set ``SUBONT_CHECKPOINT_DIR`` (an object-store / DFS path
  on a real cluster): every fixpoint round goes through a reliable
  ``df.checkpoint()`` into that directory, so a multi-hour closure at
  production scale survives executor loss and the round files are
  re-readable after restart (StageRunner gives the coarser
  stage-granularity resume on top).

Both modes cap SIZE-ESTIMATE COMPOUNDING.  Spark's
``Dataset.checkpoint`` carries the origin plan's size estimate into the
new leaf (LogicalRDD.computeStats = originStats.getOrElse(default)); in
a fixpoint loop those estimates COMPOUND MULTIPLICATIVELY round over
round — size ≈ product over every join ever executed — until the
driver spends minutes per query in BigInteger (Karatsuba/Toom-Cook)
multiplication inside SizeInBytesOnlyStatsPlanVisitor.  Measured on the
360k-concept stress extraction: the driver wedged for >30 min
at ~1000% CPU purely in stats math; a 14-round self-join microbench
goes 0.2s → 7.6s of planning per round.  The fix is ADAPTIVE: when the
carried estimate exceeds ``_STATS_BITLEN_CAP`` bits, the checkpointed
RDD is rewrapped in a fresh stats-free ``LogicalRDD``
(``_strip_stats``), resetting the compounding; below the cap the
normal checkpoint is returned untouched (keeping its preserved output
partitioning/ordering — stripping unconditionally cost ~45% on the
fixture CLI e2e).  The stripped leaf reports the conservative default
size, and AQE's runtime statistics make the actual broadcast/skew
decisions, as they already did.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _durable_dir() -> str | None:
    return os.environ.get("SUBONT_CHECKPOINT_DIR") or None


# ---------------------------------------------------------------------------
# Shipping a driver-local kernel result back to Spark.
#
# ``spark.createDataFrame(pandas)`` parallelizes Arrow batches through the
# Python gateway and every downstream action pays a python-deserialization
# scan: measured 0.4-0.6 s to create + 1.2-1.6 s per count on a 640k-row
# pair table (bench profile, round 6).  Writing the SAME Arrow data to a
# one-file parquet table and reading it back with an explicit schema is a
# JVM-native vectorized scan: 0.07 s write + 0.08 s read + 0.12 s count.
# The temp file lives for the SparkSession's lifetime (plans reference it
# lazily) in a per-process dir cleaned at exit; a fresh random name per
# call — nothing is keyed on inputs, nothing survives the process.
# ---------------------------------------------------------------------------

_SHIP_DIR: list[str] = []


def _ship_dir() -> str:
    if not _SHIP_DIR:
        import atexit
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="subont_local_ship_")
        atexit.register(shutil.rmtree, d, True)
        _SHIP_DIR.append(d)
    return _SHIP_DIR[0]


def ship_local_table(spark, arrow_table, schema_ddl: str):
    """One-file parquet roundtrip for a driver-computed pyarrow Table →
    DataFrame backed by a vectorized parquet scan (single file, row
    order preserved — local-kernel outputs stay deterministic)."""
    import os as _os
    import uuid

    import pyarrow.parquet as pq

    d = _os.path.join(_ship_dir(), uuid.uuid4().hex)
    _os.makedirs(d)
    pq.write_table(arrow_table, _os.path.join(d, "part-0.parquet"), compression="zstd")
    return spark.read.schema(schema_ddl).parquet(d)


# 256 bits ≈ a 10^77 size estimate: far beyond any physical size, far
# below the 10^100000-digit monsters compounding produces.  Estimates
# between strips multiply at most a few dozen leaves of ≤2^256 each, so
# BigInteger work stays in the trivial schoolbook range.
_STATS_BITLEN_CAP = 256

# one-time fuse: if the private-API rewrap ever fails (Spark internals
# moved), warn once and stop attempting it for the rest of the session
_strip_stats_broken = False


def _strip_stats(df: DataFrame) -> DataFrame:
    """Rewrap a checkpointed DataFrame's RDD in a fresh LogicalRDD with
    NO origin statistics (and fresh attribute ids, which also keeps the
    Spark 4.1 shared-leaf analyzer bug worked around).  The underlying
    rows were already defensively copied by Dataset.checkpoint, so the
    rewrap is plan-level only — no extra job, no data movement."""
    spark = df.sparkSession
    jdf = df._jdf
    jrdd = jdf.queryExecution().toRdd()
    jschema = spark._jvm.org.apache.spark.sql.types.DataType.fromJson(df.schema.json())
    jdf2 = spark._jsparkSession.internalCreateDataFrame(jrdd, jschema, False)
    return DataFrame(jdf2, spark)


def plan_leaf(df: DataFrame) -> DataFrame:
    """Truncate a (typically persisted) DataFrame's logical plan to a
    single stats-free leaf.  Downstream consumers then analyze /
    canonicalize a one-node scan instead of the full producing tree —
    the per-consumer catalyst cost of a big tree (cache-lookup
    canonicalization, re-optimization) was ~0.5 s per consumer at bench
    scale.  The wrapped RDD still scans the columnar cache lazily (or
    recomputes through lineage if the cache is dropped).  Falls back to
    the input unchanged if the private rewrap API moved."""
    try:
        return _strip_stats(df)
    except Exception:
        return df


def chk(df: DataFrame) -> DataFrame:
    """Lineage-truncating checkpoint, LAZY: the plan is replaced by a
    checkpointed-RDD scan immediately (so downstream self-joins see
    fresh attribute ids — the Spark 4.1 shared-leaf analyzer bug stays
    worked around), but materialization happens inside the first
    consuming action instead of a dedicated job.  Eager checkpoints cost
    one driver job EACH; across the pipeline's fixpoint loops that was
    ~30% of all jobs at fixture scale.

    With ``SUBONT_CHECKPOINT_DIR`` set the checkpoint is RELIABLE
    (written to that directory on first materialization) instead of
    executor-memory-local."""
    d = _durable_dir()
    if d:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(d)
        # EAGER + persist in durable mode: a reliable checkpoint without
        # a persisted plan recomputes the whole delta a second time for
        # the checkpoint-write job (the standard RDD.checkpoint caveat)
        # — on exactly the multi-hour runs this mode targets, that is a
        # 2x per-round cost.  persist → eager checkpoint (the write job
        # reads the cached blocks) → unpersist keeps each round computed
        # once; the extra action per round is noise at durable scale.
        persisted = df.persist()
        out = persisted.checkpoint(eager=True)
        persisted.unpersist()
    else:
        out = df.localCheckpoint(eager=False)
    # adaptive compounding cap: the carried estimate is memoized on the
    # new leaf (fromDataset already computed it), so the probe is free
    try:
        # py4j delivers the scala BigInt as a python int; values stay
        # small (< a few thousand bits) because the cap resets them
        # before they can grow
        bits = int(out._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()).bit_length()
    except Exception:
        bits = 0
    if bits > _STATS_BITLEN_CAP:
        # _strip_stats reaches through private Spark internals
        # (queryExecution().toRdd() / internalCreateDataFrame); a Spark
        # minor-version change in either API must degrade to the
        # unstripped checkpoint (slower planning under compounding, but
        # correct) — never crash the fixpoint loop it sits under.
        global _strip_stats_broken
        if not _strip_stats_broken:
            try:
                return _strip_stats(out)
            except Exception as e:  # pragma: no cover - exercised via monkeypatch test
                _strip_stats_broken = True
                import warnings

                warnings.warn(
                    "subont: stats-strip rewrap failed (%r); continuing with "
                    "unstripped checkpoints — driver planning may slow down "
                    "under size-estimate compounding" % (e,),
                    RuntimeWarning,
                    stacklevel=2,
                )
    return out


def chk_n(df: DataFrame) -> tuple[DataFrame, int]:
    """Checkpoint + count in ONE job: lazy checkpoint, then the count
    materializes it.  The eager-checkpoint-then-isEmpty pattern costs
    two driver jobs per fixpoint round; at fixture scale driver job
    latency (~0.1 s/job) IS the wall clock and the round count is the
    multiplier."""
    df = chk(df)
    return df, df.count()
