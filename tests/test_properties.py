"""Property-based tests (hypothesis) for the engine-invariance claims
the oracle comparisons rest on — checked against DuckDB directly, on
randomized inputs rather than fixture luck."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=0, max_value=1e9, allow_nan=False, allow_infinity=False))
def test_quantize2_matches_duckdb(x):
    """floor(x*100+0.5)/100 must be bit-identical in Python IEEE math
    and DuckDB (both engines execute the same IEEE ops — this is the
    money() parity claim)."""
    import math

    py = math.floor(x * 100 + 0.5) / 100
    con = duckdb.connect()
    (db,) = con.execute("SELECT floor(? * 100 + 0.5) / 100", [x]).fetchone()
    assert py == db


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=1000, allow_nan=False),
            st.floats(min_value=0, max_value=50, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    ),
    st.floats(min_value=0, max_value=1000, allow_nan=False),
)
def test_banded_interval_membership(intervals, point):
    """Bucket-explosion band join must classify membership exactly like
    the naive predicate for any interval of length <= width."""
    width = 50.0
    import math

    for lo, length in intervals:
        hi = lo + length
        naive = lo <= point <= hi
        p_bucket = math.floor(point / width)
        iv_buckets = range(math.floor(lo / width), math.floor(hi / width) + 1)
        banded = p_bucket in iv_buckets and lo <= point <= hi
        assert banded == naive


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=100), min_size=0, max_size=20),
    st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=20),
)
def test_asof_semantics_model(left_ts, right_ts):
    """Model check of the union+window as-of recipe: for each left ts,
    carrying forward the last right value over the merged, sorted,
    right-before-left-on-tie sequence equals max(right <= left)."""
    events = sorted(
        [(t, 0, t) for t in right_ts] + [(t, 1, None) for t in left_ts]
    )  # (ts, is_left, value); right (0) sorts before left (1) at ties
    carried, results = None, {}
    for ts, is_left, val in events:
        if is_left == 0:
            carried = val if carried is None else max(carried, val)
        else:
            results.setdefault(ts, carried)
    for t in left_ts:
        eligible = [r for r in right_ts if r <= t]
        expected = max(eligible) if eligible else None
        assert results[t] == expected
