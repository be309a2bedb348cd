"""Layout writer (§2.11): partition pruning and row-group locality —
the Spark re-expression of the reference's value/RID indexes."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from skyhookdb_ceph_spark.catalog import Catalog
from skyhookdb_ceph_spark.operators.layout import read_partitioned, write_partitioned
from skyhookdb_ceph_spark.operators.stats import column_stats
from skyhookdb_ceph_spark.plans.explain import explain_str


@pytest.fixture(scope="module")
def partitioned_lineitem(spark):
    sf = "/root/testdata/sf0.001"
    tmp = tempfile.mkdtemp(prefix="skyhook_layout_")
    li = Catalog(spark, sf).lineitem
    write_partitioned(
        li, f"{tmp}/li", partition_cols=["l_returnflag"], sort_cols=["l_orderkey"]
    )
    yield spark, sf, f"{tmp}/li"
    shutil.rmtree(tmp, ignore_errors=True)


def test_partition_pruning_in_plan(partitioned_lineitem):
    spark, _, path = partitioned_lineitem
    df = read_partitioned(spark, path).filter(F.col("l_returnflag") == "R")
    plan = explain_str(df)
    assert "PartitionFilters" in plan
    assert "l_returnflag" in plan.split("PartitionFilters", 1)[1].splitlines()[0]


def test_partitioned_roundtrip_preserves_rows(partitioned_lineitem):
    spark, sf, path = partitioned_lineitem
    orig = Catalog(spark, sf).lineitem
    got = read_partitioned(spark, path)
    assert got.count() == orig.count()
    a = orig.filter("l_returnflag = 'R'").agg(F.sum("l_quantity")).collect()[0][0]
    b = got.filter("l_returnflag = 'R'").agg(F.sum("l_quantity")).collect()[0][0]
    assert abs(a - b) < 1e-6


def test_column_stats_shape(spark):
    li = Catalog(spark, "/root/testdata/sf0.001").lineitem
    rows = {r.col: r for r in column_stats(li, ["l_quantity", "l_discount"]).collect()}
    assert rows["l_quantity"].cnt == 6000
    assert rows["l_quantity"].min_val >= 0
    assert rows["l_discount"].ndv > 1
