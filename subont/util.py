"""Shared checkpoint helpers.

At cluster scale these become reliable checkpoints to object storage; in
local mode localCheckpoint truncates lineage between fixpoint rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def chk(df: DataFrame) -> DataFrame:
    """Lineage-truncating checkpoint, LAZY: the plan is replaced by a
    checkpointed-RDD scan immediately (so downstream self-joins see
    fresh attribute ids — the Spark 4.1 shared-leaf analyzer bug stays
    worked around), but materialization happens inside the first
    consuming action instead of a dedicated job.  Eager checkpoints cost
    one driver job EACH; across the pipeline's fixpoint loops that was
    ~30% of all jobs at fixture scale."""
    return df.localCheckpoint(eager=False)


def chk_n(df: DataFrame) -> tuple[DataFrame, int]:
    """Checkpoint + count in ONE job: lazy localCheckpoint, then the
    count materializes it.  The eager-checkpoint-then-isEmpty pattern
    costs two driver jobs per fixpoint round; at fixture scale driver
    job latency (~0.1 s/job) IS the wall clock and the round count is
    the multiplier."""
    df = df.localCheckpoint(eager=False)
    return df, df.count()
