"""Explicit skew mitigation helpers (SURVEY.md §2.7, north rule).

AQE's runtime skew-join split (on in session.py) handles most cases;
``salted_join`` is the explicit fallback for joins AQE cannot split —
e.g. a broadcast-unfriendly dimension joined on a hub key (SCT top is
an ancestor of all ~360k concepts; mega-repos hold ~30% of corpus
rows).  The probe side gets a deterministic per-row salt (hash of the
whole row — never rand(), which breaks retry determinism/resume), the
build side is replicated across all salt values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big ⋈ dim`` on column ``on`` with an ``salt``-way salted
    key, spreading each hot key over ``salt`` reducers.

    dim is replicated salt× (keep it the smaller side)."""
    big_cols = big.columns
    bs = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big_cols]), F.lit(salt))
    )
    ds = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))).withColumn(
        "__salt", F.col("__salt").cast("bigint")
    )
    out = bs.join(ds, [on, "__salt"], how)
    return out.drop("__salt")


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts for the heaviest keys — feed this
    to decide salt factors / broadcast choices."""
    return df.groupBy(key).count().orderBy(F.col("count").desc()).limit(top)
