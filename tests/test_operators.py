"""Operator-library unit tests: asof, banded range join, minhash,
simhash, vectors — verified against independent formulations."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from skyhookdb_ceph_spark.operators.asof import asof_join
from skyhookdb_ceph_spark.operators.minhash import jaccard_pairs, shingle_sets
from skyhookdb_ceph_spark.operators.range_join import banded_interval_join
from skyhookdb_ceph_spark.operators.simhash import (
    simhash_pairs,
    simhash_signatures,
)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [Row(k=1, ts=10, tag="a"), Row(k=1, ts=20, tag="b"), Row(k=2, ts=5, tag="c")]
    )
    right = spark.createDataFrame(
        [Row(k=1, rts=8, v=100), Row(k=1, rts=10, v=200), Row(k=1, rts=15, v=300),
         Row(k=2, rts=9, v=400)]
    )
    out = {
        (r.k, r.ts): r.v_out
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts",
            value_col="v", out_col="v_out",
        ).collect()
    }
    assert out[(1, 10)] == 200  # equal timestamp qualifies (<= semantics)
    assert out[(1, 20)] == 300
    assert out[(2, 5)] is None  # no right row at or before


def test_banded_interval_join_matches_naive_theta(spark, sf_small):
    from skyhookdb_ceph_spark.catalog import Catalog

    c = Catalog(spark, sf_small)
    p = c.part.select("p_partkey", "p_retailprice")
    s = c.supplier.select("s_suppkey", "s_acctbal")
    lo = F.col("s_acctbal") / 4
    naive = (
        s.crossJoin(p)
        .filter((F.col("p_retailprice") >= lo) & (F.col("p_retailprice") <= lo + 20))
        .select("s_suppkey", "p_partkey")
    )
    banded = banded_interval_join(p, s, "p_retailprice", lo, lo + 20, 20.0).select(
        "s_suppkey", "p_partkey"
    )
    assert sorted(map(tuple, banded.collect())) == sorted(map(tuple, naive.collect()))


def test_minhash_identical_docs_get_jaccard_one(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=3, text="an entirely different sentence with other words here"),
        ]
    )
    pairs = jaccard_pairs(docs, threshold=0.9).collect()
    assert [(r.doc_a, r.doc_b, r.jac) for r in pairs] == [(1, 2, 1.0)]


def test_shingles_are_distinct_word_triples(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b c d")])
    [row] = shingle_sets(docs).collect()
    assert sorted(row.shingles) == ["a b c", "b c d"]


def test_simhash_pairs_identical_and_near_docs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=5, text="alpha beta gamma delta epsilon zeta eta theta"),
            Row(doc_id=9, text="alpha beta gamma delta epsilon zeta eta theta"),
            Row(doc_id=7, text="unrelated totally different content words here now ok"),
        ]
    )
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_pairs(docs).collect()}
    assert pairs.get((5, 9)) == 0  # identical docs -> hamming 0
    assert all(a != 7 and b != 7 for a, b in pairs)  # unrelated doc excluded


def test_simhash_signature_is_64_bits(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="alpha beta gamma")])
    [row] = simhash_signatures(docs).collect()
    assert len(row.sig) == 64 and set(row.sig) <= {"0", "1"}


def test_guard_global_window_enforces_dimension_scale(spark):
    """q_win_ntile_pct's dimension-only restriction is enforced, not
    just documented: past the row bound the guard raises instead of
    planning a single-task global sort."""
    import pytest as _pytest

    from skyhookdb_ceph_spark.operators import (
        GlobalWindowScaleError,
        guard_global_window,
    )

    small = spark.range(100)
    assert guard_global_window(small, max_rows=1000) is small
    with _pytest.raises(GlobalWindowScaleError, match="single-task global sort"):
        guard_global_window(small, max_rows=10)
    # explicit override for operators that accept the cost knowingly
    import os

    os.environ["SPARK_GRAFT_ALLOW_GLOBAL_WINDOW"] = "1"
    try:
        assert guard_global_window(small, max_rows=10) is small
    finally:
        del os.environ["SPARK_GRAFT_ALLOW_GLOBAL_WINDOW"]
