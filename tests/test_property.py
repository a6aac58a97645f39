"""Property-based tests (hypothesis) for the pure-python kernels —
no SparkSession needed, so these run in milliseconds."""

from hypothesis import given, settings
from hypothesis import strategies as st

from subont.model import And, Some, pv_id_for
from subont.rf2 import _D, _INV, _P, _verhoeff_digit
from subont.rf2_io import parse_subset_json, parse_subset_text


def _verhoeff_valid(s: str) -> bool:
    """Standard Verhoeff validation: checksum of the full string
    (including the check digit) must be 0."""
    c = 0
    for i, ch in enumerate(reversed(s)):
        c = _D[c][_P[i % 8][int(ch)]]
    return c == 0


@given(st.integers(min_value=0, max_value=10**18))
@settings(max_examples=300)
def test_verhoeff_digit_validates(n):
    s = str(n)
    d = _verhoeff_digit(s)
    assert 0 <= d <= 9
    assert _verhoeff_valid(s + str(d))
    # any single-digit corruption of the payload is detected
    if len(s) >= 1 and s[0] != "9":
        corrupted = str(int(s[0]) + 1) + s[1:]
        assert not _verhoeff_valid(corrupted + str(d))


@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=10**15), st.booleans()),
        min_size=0,
        max_size=20,
    )
)
@settings(max_examples=100)
def test_subset_text_roundtrip(rows):
    text = "".join(
        ("<<" if desc else "") + str(cid) + " |term with spaces|\n" for cid, desc in rows
    )
    assert parse_subset_text(text) == rows


@given(st.lists(st.integers(min_value=1, max_value=10**15), min_size=0, max_size=20))
@settings(max_examples=100)
def test_subset_json_skips_header(ids):
    text = "conceptIds\n" + "".join(f"{i}\n" for i in ids)
    assert parse_subset_json(text) == [(i, False) for i in ids]


@given(
    st.integers(min_value=1, max_value=10**9),
    st.lists(st.integers(min_value=1, max_value=10**9), min_size=2, max_size=6, unique=True),
)
@settings(max_examples=100)
def test_pv_id_conjunct_order_invariant(role, members):
    """Content-hash PV ids are invariant under conjunct permutation —
    the invariant that makes distributed re-minting idempotent."""
    a = pv_id_for(Some(role, And(list(members))))
    b = pv_id_for(Some(role, And(list(reversed(members)))))
    assert a == b < 0


@given(
    st.integers(min_value=1, max_value=10**9),
    st.integers(min_value=1, max_value=10**9),
    st.integers(min_value=1, max_value=10**9),
)
@settings(max_examples=100)
def test_pv_id_nesting_injective_shape(role, inner_role, filler):
    """Nested vs flat shapes never collide (kind-tagged tokens)."""
    nested = pv_id_for(Some(role, Some(inner_role, filler)))
    flat = pv_id_for(Some(role, filler))
    assert nested != flat


# ---------------------------------------------------------------------------
# Sessionization kernel: gap_split (vectorized) vs a one-pass reference,
# under ANY chunking of the event stream into micro-batches.
# ---------------------------------------------------------------------------

def _ref_sessionize(all_ts, gap_seconds):
    """Straightforward single-pass model over the fully-sorted stream."""
    closed, start, last, n = [], None, None, 0
    for t in sorted(all_ts):
        if last is not None and (t - last).total_seconds() > gap_seconds:
            closed.append((start, last, n))
            start, n = None, 0
        if start is None:
            start = t
        last = t
        n += 1
    return closed, (last, start, n)


@given(
    st.lists(
        st.integers(min_value=0, max_value=50_000),  # seconds offsets
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=5),  # number of batches
    st.integers(min_value=30, max_value=3600),  # gap seconds
)
@settings(max_examples=150, deadline=None)
def test_gap_split_matches_reference_any_batching(offsets, n_batches, gap):
    import datetime

    import pandas as pd

    from subont.streaming import gap_split

    base = datetime.datetime(2024, 1, 1)
    ts_all = sorted(base + datetime.timedelta(seconds=o) for o in offsets)
    # batches must be time-ordered BETWEEN batches (stream semantics:
    # a later micro-batch carries later events), arbitrary order WITHIN
    k, per = len(ts_all), max(1, len(ts_all) // n_batches)
    batches = [ts_all[i : i + per] for i in range(0, k, per)]

    state = (None, None, 0)
    closed = []
    for batch in batches:
        # scramble within the batch: gap_split must sort internally
        scrambled = pd.Series(pd.to_datetime(list(reversed(batch))))
        got, state = gap_split(scrambled, state, gap)
        closed.extend(got)

    exp_closed, exp_state = _ref_sessionize(ts_all, gap)
    norm = lambda rows: [  # noqa: E731
        (pd.Timestamp(s), pd.Timestamp(e), int(n)) for s, e, n in rows
    ]
    assert norm(closed) == norm(exp_closed)
    l, s, n = state
    el, es, en = exp_state
    assert (pd.Timestamp(l), pd.Timestamp(s), int(n)) == (
        pd.Timestamp(el), pd.Timestamp(es), int(en),
    )
