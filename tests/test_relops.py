"""Regression tests for the as-of / range join extension operators."""

from datetime import datetime

import pyspark.sql.functions as F

from subont.relops import asof_join, range_join_window


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_carries_whole_row_not_per_column(spark):
    """A NULL in one payload column of the most recent right row must NOT
    be backfilled from an older right row — all carried columns come
    from the SAME right record (struct carry)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "L")], "k long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 08:00:00"), "old-a", "old-b"),
            (1, _ts("2024-01-01 09:00:00"), None, "new-b"),  # most recent; a is NULL
        ],
        "k long, ts timestamp, a string, b string",
    )
    out = asof_join(left, right, key="k", ts="ts").collect()
    assert len(out) == 1
    r = out[0]
    assert r.b_right == "new-b"
    assert r.a_right is None  # NOT 'old-a' — mixed-row carry would be wrong
    assert r.ts_right == _ts("2024-01-01 09:00:00")


def test_asof_no_match_yields_nulls(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 07:00:00"))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 5)], "k long, ts timestamp, x long"
    )
    r = asof_join(left, right, key="k", ts="ts").collect()[0]
    assert r.x_right is None and r.ts_right is None


def test_range_join_pre_1970_band(spark):
    """Negative-epoch timestamps: cast-toward-zero banding mis-assigned
    adjacent bands; floor() banding must still pair rows straddling a
    band boundary before 1970."""
    rows = [
        (1, 1, _ts("1969-12-31 23:55:00")),  # epoch -300
        (1, 2, _ts("1970-01-01 00:02:00")),  # epoch +120 (gap 420 ≤ 600)
        (1, 3, _ts("1969-12-31 23:40:00")),  # epoch -1200 (gap to #1 = 900 > 600)
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    pairs = {
        (r.id_a, r.id_b)
        for r in range_join_window(
            ev, id_col="event_id", ts="ts", max_gap_seconds=600, key="user_id"
        ).collect()
    }
    assert (1, 2) in pairs
    assert (3, 1) not in pairs
    assert (3, 2) not in pairs
