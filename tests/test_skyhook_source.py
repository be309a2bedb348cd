"""Custom pushdown DataSource: correctness vs the built-in reader,
stats pruning, and the relation-reuse hazard the helper guards against."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from skyhookdb_ceph_spark.catalog import Catalog
from skyhookdb_ceph_spark.sources.skyhook_source import (
    SkyhookReader,
    read_skyhook,
)

LI = "/root/testdata/sf0.001/lineitem.parquet"


def test_pushdown_source_matches_builtin_reader(spark, sf_small):
    builtin = Catalog(spark, sf_small).lineitem
    pred = (F.col("l_extendedprice") > 91400) & (F.col("l_quantity") < 30)
    expected = sorted(
        map(tuple, builtin.filter(pred).select("l_orderkey", "l_linenumber").collect())
    )
    got = sorted(
        map(
            tuple,
            read_skyhook(spark, LI)
            .filter(pred)
            .select("l_orderkey", "l_linenumber")
            .collect(),
        )
    )
    assert got == expected


def test_fresh_relation_isolation(spark):
    assert read_skyhook(spark, LI).filter("l_extendedprice > 91400").count() > 0
    assert read_skyhook(spark, LI).count() == 6000  # unaffected by prior filters


def test_reader_accepts_comparison_filters():
    from pyspark.sql.datasource import EqualTo, GreaterThan, StringContains

    r = SkyhookReader(LI)
    remaining = list(
        r.pushFilters(
            [
                GreaterThan(("l_extendedprice",), 91400.0),
                EqualTo(("l_returnflag",), "A"),
                StringContains(("l_returnflag",), "A"),  # not supported
            ]
        )
    )
    assert len(r.accepted) == 2
    assert len(remaining) == 1  # the unsupported one goes back to Spark


def test_row_group_pruning_skips_impossible_groups():
    from pyspark.sql.datasource import GreaterThan

    max_price = pq.read_table(LI, columns=["l_extendedprice"])
    hi = max(max_price.column(0).to_pylist())
    r = SkyhookReader(LI)
    list(r.pushFilters([GreaterThan(("l_extendedprice",), hi + 1)]))
    assert r.partitions() == []  # every row group proven empty by stats
