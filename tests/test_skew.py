"""Salted aggregation must be algebraically identical to the direct
groupBy — the skew-mitigation path can never change results."""

from __future__ import annotations

from pyspark.sql import functions as F

from skyhookdb_ceph_spark.catalog import Catalog
from skyhookdb_ceph_spark.operators.skew import salted_sum_count


def test_salted_agg_matches_direct(spark, sf_small):
    li = Catalog(spark, sf_small).lineitem
    direct = {
        r.l_returnflag: (round(r.s, 6), r.c)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        r.l_returnflag: (round(r.sum_l_quantity, 6), r.cnt)
        for r in salted_sum_count(
            li, ["l_returnflag"], "l_quantity", F.col("l_orderkey"), n_salts=16
        ).collect()
    }
    assert salted == direct


def test_salted_agg_spreads_hot_key(spark, sf_small):
    li = Catalog(spark, sf_small).lineitem
    # every row same key = worst-case skew; partial phase must still
    # produce n_salts groups before the final 1-row reduce
    hot = li.withColumn("k", F.lit("hot"))
    out = salted_sum_count(hot, ["k"], "l_quantity", F.col("l_orderkey")).collect()
    assert len(out) == 1
    assert out[0].cnt == 6000
