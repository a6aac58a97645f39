"""Relational extension operators beyond the reference's surface
(SURVEY.md §2.6 notes the reference has no range/as-of joins; a
training-data pipeline needs them, so they are first-class here).

``asof_join`` — for each left row, the most recent right row with
``right.ts <= left.ts`` per key.  Spark-first formulation: NO join at
all — union the two sides with a side tag and carry the latest right
payload forward with a per-key ordered window (``last(..., ignorenulls)``
over rowsBetween(unboundedPreceding, current)).  One shuffle on the key,
partition-parallel, skew-bounded by the per-key window — the classic
scalable as-of shape (a naive theta-join would be per-key quadratic).

``range_join_window`` — pairs of rows within a bounded time distance,
bucketed by coarse time band so candidate pairs are per-band, never
global (the standard interval-join blocking; Spark's optimizer has no
native interval join, so the bucketing IS the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: left rows enriched with the most recent right
    row (right.ts ≤ left.ts) for the same key.  Ties on equal ts resolve
    to the right row (right sorts before left at the same instant);
    among right rows at the same instant the greatest ``tiebreak`` value
    wins (pass one for full determinism).

    The whole right payload is carried as ONE struct through a single
    ``last(..., ignorenulls)`` window, so every carried column comes from
    the SAME right row — per-column carries would mix rows whenever the
    most recent right row holds a NULL in one payload column."""
    right_cols = right_cols or [c for c in right.columns if c not in (key, ts)]
    # tiebreak names a right column (accepts the suffixed output name too)
    if tiebreak and tiebreak not in right.columns:
        stripped = tiebreak[: -len(suffix)] if tiebreak.endswith(suffix) else tiebreak
        if stripped in right.columns:
            tiebreak = stripped
        else:
            raise ValueError(f"tiebreak {tiebreak!r} is not a right column")
    payload = F.struct(
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(ts).alias(f"{ts}{suffix}"),
    )
    rhs = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        payload.alias("_rpay"),
        *([F.col(tiebreak).alias("_tb")] if tiebreak else []),
    )
    for c in left.columns:
        if c not in (key, ts):
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    pay_type = rhs.schema["_rpay"].dataType
    lhs = left.withColumn("_side", F.lit(1)).withColumn(
        "_rpay", F.lit(None).cast(pay_type)
    )
    if tiebreak:
        lhs = lhs.withColumn("_tb", F.lit(None).cast(right.schema[tiebreak].dataType))
    cols = [*left.columns, "_side", "_rpay"] + (["_tb"] if tiebreak else [])
    merged = lhs.select(cols).unionByName(rhs.select(cols))
    order = [F.col(ts).asc(), F.col("_side").asc()]
    if tiebreak:
        order.append(F.col("_tb").asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn("_rpay", F.last("_rpay", ignorenulls=True).over(w))
    return carried.filter(F.col("_side") == 1).select(
        *left.columns,
        *[F.col(f"_rpay.{c}{suffix}").alias(f"{c}{suffix}") for c in right_cols],
        F.col(f"_rpay.{ts}{suffix}").alias(f"{ts}{suffix}"),
    )


def range_join_window(
    events: DataFrame,
    id_col: str,
    ts: str,
    max_gap_seconds: int,
    key: str | None = None,
) -> DataFrame:
    """Self range-join: pairs (a, b) with ``0 < b.ts - a.ts <= gap``
    (optionally within the same ``key``).  Each row lands in its time
    band and the next (gap-sized bands), so every qualifying pair meets
    in exactly one band-equi-join — no global cross product."""
    # floor (not cast/truncate-toward-zero) so pre-1970 negative epochs
    # band correctly; exact epoch double keeps sub-second inputs on the
    # same arithmetic as the ≤-gap filter below.
    def _band_of(c):
        return F.floor(c.cast("timestamp").cast("double") / max_gap_seconds).cast("long")

    base_cols = ([key] if key else []) + [id_col, ts]
    a = events.select(*base_cols).withColumn("_band", _band_of(F.col(ts)))
    a = a.unionByName(a.withColumn("_band", F.col("_band") + 1))
    b = events.select(
        *([F.col(key)] if key else []),
        F.col(id_col).alias("_b_id"),
        F.col(ts).alias("_b_ts"),
    ).withColumn("_band", _band_of(F.col("_b_ts")))
    on = ["_band"] + ([key] if key else [])
    pairs = (
        a.join(b, on)
        .filter(
            (F.col("_b_ts") > F.col(ts))
            # exact epoch seconds (micros preserved): unix_timestamp()
            # truncates to whole seconds and disagrees with sub-second
            # inputs at the gap boundary.  NTZ inputs cast via TIMESTAMP
            # (session is UTC → same naive arithmetic as the oracle).
            & (
                F.col("_b_ts").cast("timestamp").cast("double")
                - F.col(ts).cast("timestamp").cast("double")
                <= max_gap_seconds
            )
        )
        .select(
            *([key] if key else []),
            F.col(id_col).alias("id_a"),
            F.col("_b_id").alias("id_b"),
            F.col(ts).alias("ts_a"),
            F.col("_b_ts").alias("ts_b"),
        )
        .distinct()
    )
    return pairs
