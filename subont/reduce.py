"""Grouped antichain redundancy elimination (A5/A6) + primitivity.

The reference's workhorse ``eliminateWeakerClasses`` removes from a set
every class that is a strict ancestor of another member (keep the
most-specific antichain; OntologyReasoningService.java:143-157, helper
:203-210).  The reference loops pairwise per set; here one anti-join
serves *all* sets at once:

    pairs(set_id, a, b) = cand ⋈ cand within each set   (set-bounded)
    weak(set_id, cls)   = pairs ⋉ closure on (desc=b, anc=a)
    result              = cand ▷ weak                    (left_anti)

Join-order discipline for scale: member PAIRS are generated first — a
quadratic bounded by the (small, ~10s of conjuncts) candidate sets —
and the big closure is touched exactly once, as the build side of a
single (desc, anc) two-column semi-join.  The naive order
(cand ⋈ closure on cls == anc first) fans every candidate out to its
full descendant set: on a 360k-concept closure a hub ancestor like the
SCT root carries hundreds of thousands of descendants per candidate
row, the exact skew square this module must never materialize.

Equivalent members are never removed (closure is strict), matching the
reference's assumption of no equivalent classes (:142 comment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _member_pairs(cand: DataFrame, set_col: str, cls_col: str) -> DataFrame:
    """Distinct ordered member pairs (__s, __cls, __other) per set —
    explicit renames on both self-join sides (Spark 4.1 shared-leaf
    checkpoint workaround + unambiguous attribute ids)."""
    left = cand.select(F.col(set_col).alias("__s"), F.col(cls_col).alias("__cls"))
    right = cand.select(F.col(set_col).alias("__s"), F.col(cls_col).alias("__other"))
    return left.join(right, "__s").filter(F.col("__cls") != F.col("__other"))


def eliminate_weaker(cand: DataFrame, closure: DataFrame, set_col: str = "set_id", cls_col: str = "cls") -> DataFrame:
    """Keep most-specific members per group.

    cand: (set_col, cls_col) — candidate sets exploded to rows.
    closure: strict (desc, anc).
    """
    pairs = _member_pairs(cand, set_col, cls_col)
    # cls is weak iff some same-set member is a strict descendant of it
    weak = (
        pairs.join(
            closure,
            (F.col("__other") == closure.desc) & (F.col("__cls") == closure.anc),
            "left_semi",
        )
        .select(F.col("__s").alias(set_col), F.col("__cls").alias(cls_col))
        .distinct()
    )
    return cand.join(weak, [set_col, cls_col], "left_anti")


def eliminate_stronger(cand: DataFrame, closure: DataFrame, set_col: str = "set_id", cls_col: str = "cls") -> DataFrame:
    """Dual (A6): keep most-general members per group
    (OntologyReasoningService.java:159-173)."""
    pairs = _member_pairs(cand, set_col, cls_col)
    # cls is strong iff some same-set member is a strict ancestor of it
    strong = (
        pairs.join(
            closure,
            (F.col("__cls") == closure.desc) & (F.col("__other") == closure.anc),
            "left_semi",
        )
        .select(F.col("__s").alias(set_col), F.col("__cls").alias(cls_col))
        .distinct()
    )
    return cand.join(strong, [set_col, cls_col], "left_anti")
