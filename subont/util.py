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
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _durable_dir() -> str | None:
    return os.environ.get("SUBONT_CHECKPOINT_DIR") or None


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
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)


def chk_n(df: DataFrame) -> tuple[DataFrame, int]:
    """Checkpoint + count in ONE job: lazy checkpoint, then the count
    materializes it.  The eager-checkpoint-then-isEmpty pattern costs
    two driver jobs per fixpoint round; at fixture scale driver job
    latency (~0.1 s/job) IS the wall clock and the round count is the
    multiplier."""
    df = chk(df)
    return df, df.count()
