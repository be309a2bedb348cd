"""Bucketed co-located join: the write-time shuffle must eliminate the
join-time Exchange on both sides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skyhookdb_ceph_spark.catalog import Catalog
from skyhookdb_ceph_spark.operators.bucketing import colocated_join, write_bucketed
from skyhookdb_ceph_spark.plans.explain import explain_str


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    sf = "/root/testdata/sf0.001"
    c = Catalog(spark, sf)
    write_bucketed(
        c.lineitem.withColumnRenamed("l_orderkey", "okey"),
        "li_b", ["okey"], 8, sort_cols=["okey"],
    )
    write_bucketed(
        c.orders.withColumnRenamed("o_orderkey", "okey"),
        "ord_b", ["okey"], 8, sort_cols=["okey"],
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_has_no_exchange(bucketed_tables):
    spark = bucketed_tables
    joined = colocated_join(spark, "li_b", "ord_b", on=["okey"])
    plan = explain_str(joined, "simple")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # both sides pre-shuffled at write time


def test_bucketed_join_results_match_plain_join(bucketed_tables):
    spark = bucketed_tables
    sf = "/root/testdata/sf0.001"
    c = Catalog(spark, sf)
    expected = (
        c.lineitem.join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    got = colocated_join(spark, "li_b", "ord_b", on=["okey"]).count()
    assert got == expected


def test_bucket_prune_selects_only_matching_buckets(spark):
    """q_scan_bucket_prune's point read must open only the buckets the
    IN-list keys hash to: SelectedBucketsCount strictly below the
    bucket total, with the IN filter still pushed to the scan."""
    import re

    from skyhookdb_ceph_spark.registry import load_all

    df = load_all()["q_scan_bucket_prune"].fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = explain_str(df)
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, "bucket pruning must be visible in the scan"
    assert int(m.group(1)) < int(m.group(2))
    assert re.search(r"PushedFilters: \[In\(o_custkey", plan)
    # scoped per-run table names clean themselves up (bucketing.py)
