"""Grouped antichain redundancy elimination (A5/A6) + primitivity.

The reference's workhorse ``eliminateWeakerClasses`` removes from a set
every class that is a strict ancestor of another member (keep the
most-specific antichain; OntologyReasoningService.java:143-157, helper
:203-210).  The reference loops pairwise per set; here one anti-join
serves *all* sets at once:

    weak(set_id, cls) = cand ⋈ closure ⋈ cand  (cls ancestor of other member)
    result            = cand ▷ weak            (left_anti)

Equivalent members are never removed (closure is strict), matching the
reference's assumption of no equivalent classes (:142 comment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def eliminate_weaker(cand: DataFrame, closure: DataFrame, set_col: str = "set_id", cls_col: str = "cls") -> DataFrame:
    """Keep most-specific members per group.

    cand: (set_col, cls_col) — candidate sets exploded to rows.
    closure: strict (desc, anc).
    """
    other = cand.select(F.col(set_col).alias("__s"), F.col(cls_col).alias("__other"))
    weak = (
        cand.alias("c")
        .join(closure.alias("cl"), F.col(f"c.{cls_col}") == F.col("cl.anc"))
        .join(
            other,
            (F.col("__s") == F.col(f"c.{set_col}")) & (F.col("__other") == F.col("cl.desc")),
            "left_semi",
        )
        .select(F.col(f"c.{set_col}").alias(set_col), F.col(f"c.{cls_col}").alias(cls_col))
        .distinct()
    )
    return cand.join(weak, [set_col, cls_col], "left_anti")


def eliminate_stronger(cand: DataFrame, closure: DataFrame, set_col: str = "set_id", cls_col: str = "cls") -> DataFrame:
    """Dual (A6): keep most-general members per group
    (OntologyReasoningService.java:159-173)."""
    other = cand.select(F.col(set_col).alias("__s"), F.col(cls_col).alias("__other"))
    strong = (
        cand.alias("c")
        .join(closure.alias("cl"), F.col(f"c.{cls_col}") == F.col("cl.desc"))
        .join(
            other,
            (F.col("__s") == F.col(f"c.{set_col}")) & (F.col("__other") == F.col("cl.anc")),
            "left_semi",
        )
        .select(F.col(f"c.{set_col}").alias(set_col), F.col(f"c.{cls_col}").alias(cls_col))
        .distinct()
    )
    return cand.join(strong, [set_col, cls_col], "left_anti")
