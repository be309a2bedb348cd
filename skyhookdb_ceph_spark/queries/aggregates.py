"""Aggregations (SURVEY.md §2.4).

Reference: min/max/sum/count computed *inside the scan* as agg
predicates, one partial row per object, client merges partials
[U: cls_tabular_utils.h — SOT_min/max/sum/cnt;
 run-query.cc — query a + client merge].  Spark's two-phase
HashAggregate (partial on the mapper, final after the shuffle) is the
same pattern, chosen automatically by the planner — at 100 TB only the
per-group partial rows cross the network, never the raw scan.
"""

from __future__ import annotations

from skyhookdb_ceph_spark.queries._util import Catalog, F, money, quantize, ratio
from skyhookdb_ceph_spark.registry import query


@query(
    "q_agg_scalar",
    oracle=(
        "SELECT min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price, "
        "floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_price, count(*) AS cnt FROM lineitem"
    ),
)
def q_agg_scalar(spark, sf_dir):
    """Global min/max/sum/count — the reference's 'query a' shape over
    lineitem [U: run-query.cc — query a]."""
    li = Catalog(spark, sf_dir).lineitem
    return li.agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        money(F.sum("l_extendedprice")).alias("sum_price"),
        F.count(F.lit(1)).alias("cnt"),
    )


@query(
    "q_agg_groupby",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty, "
        "floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base_price, "
        "floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS sum_disc_price, "
        "floor((avg(l_quantity)) * 1000000 + 0.5) / 1000000 AS avg_qty, "
        "floor((avg(l_extendedprice)) * 10000 + 0.5) / 10000 AS avg_price, "
        "floor((avg(l_discount)) * 1000000 + 0.5) / 1000000 AS avg_disc, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02' "
        "GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus"
    ),
)
def q_agg_groupby(spark, sf_dir):
    """FLAGSHIP: TPC-H Q1 shape — scan, pushed filter, grouped
    multi-aggregate, order.  This is the reference's banner capability
    composed end-to-end [P1]; Catalyst plans
    Scan(PushedFilters) -> partial HashAggregate -> Exchange ->
    final HashAggregate -> single-partition Sort.

    The final sort is coalesce(1) + sortWithinPartitions rather than
    orderBy: the aggregate's output cardinality is SCHEMA-bounded
    (|returnflag| x |linestatus| = 6 groups at any scale factor, 100 TB
    included), so a global range-partitioned sort would spend a
    sampling job + an exchange ordering 6 rows.  Measured at sf0.1:
    645 -> 420 ms median-of-5, 2 jobs -> 1 (r7 verdict item 4).  The
    partial/final aggregate and the pushed filter are untouched — only
    the bounded post-aggregate tail changed.  coalesce on the
    post-shuffle side also runs the final aggregate in one task, which
    is the right plan for 6 groups of pre-merged partials."""
    li = Catalog(spark, sf_dir).lineitem
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum("l_quantity")).alias("sum_qty"),
            money(F.sum("l_extendedprice")).alias("sum_base_price"),
            money(F.sum(disc_price)).alias("sum_disc_price"),
            ratio(F.avg("l_quantity")).alias("avg_qty"),
            quantize(F.avg("l_extendedprice"), 4).alias("avg_price"),
            ratio(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .coalesce(1)
        .sortWithinPartitions("l_returnflag", "l_linestatus")
    )


@query(
    "q_agg_having",
    oracle=(
        "SELECT o_custkey, count(*) AS order_cnt, floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS spend "
        "FROM orders GROUP BY o_custkey HAVING count(*) > 12"
    ),
)
def q_agg_having(spark, sf_dir):
    """Post-aggregation filter (client-side in the reference)."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            money(F.sum("o_totalprice")).alias("spend"),
        )
        .filter(F.col("order_cnt") > 12)
    )


@query(
    "q_agg_distinct",
    oracle=(
        "SELECT count(DISTINCT l_partkey) AS distinct_parts, "
        "count(DISTINCT l_suppkey) AS distinct_supps, "
        "count(DISTINCT l_returnflag) AS distinct_flags FROM lineitem"
    ),
)
def q_agg_distinct(spark, sf_dir):
    li = Catalog(spark, sf_dir).lineitem
    return li.agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.countDistinct("l_returnflag").alias("distinct_flags"),
    )


@query(
    "q_agg_approx_distinct",
    oracle="SELECT true AS parts_ok, true AS orders_ok",
)
def q_agg_approx_distinct(spark, sf_dir):
    """Approximate count-distinct (HyperLogLog++).  At 100 TB an exact
    distinct is a full shuffle of the key universe; the sketch is
    mergeable per-partition (constant memory, no row shuffle) — the same
    partial/merge shape the reference hard-codes for exact aggs.

    Sketch-independent oracle: DuckDB's HLL produces different estimates,
    so the checked output is the error-band verdict |approx-exact|/exact
    <= 3*rsd, which must be true for a correct sketch; the oracle emits
    the same booleans.  If the sketch drifts out of band the hash fails.
    """
    li = Catalog(spark, sf_dir).lineitem
    # One distinct-aggregate per column (HLL is duplicate-insensitive,
    # so sketching the distinct set gives the identical estimate) —
    # avoids the Expand operator a multi-column DISTINCT agg plans.
    a = li.select("l_partkey").distinct().agg(
        F.count(F.lit(1)).alias("ep"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("ap"),
    )
    b = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("eo"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("ao"),
    )
    band = 3 * 0.02
    return a.crossJoin(b).select(
        (F.abs(F.col("ap") - F.col("ep")) / F.col("ep") <= band).alias("parts_ok"),
        (F.abs(F.col("ao") - F.col("eo")) / F.col("eo") <= band).alias("orders_ok"),
    )


@query(
    "q_agg_rollup",
    oracle=(
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt, "
        "floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty "
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
    ),
)
def q_agg_rollup(spark, sf_dir):
    """Hierarchical subtotals (ROLLUP) — one pass, grouping-set
    expansion happens in the aggregate, not via repeated scans."""
    li = Catalog(spark, sf_dir).lineitem
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        money(F.sum("l_quantity")).alias("sum_qty"),
    )


@query(
    "q_agg_cube",
    oracle=(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS cnt "
        "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"
    ),
)
def q_agg_cube(spark, sf_dir):
    o = Catalog(spark, sf_dir).orders
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@query(
    "q_agg_percentiles",
    oracle=(
        "SELECT l_returnflag, "
        "floor((quantile_cont(l_extendedprice, 0.5)) * 10000 + 0.5) / 10000 AS p50, "
        "floor((quantile_cont(l_extendedprice, 0.9)) * 10000 + 0.5) / 10000 AS p90, "
        "floor((quantile_cont(l_extendedprice, 0.99)) * 10000 + 0.5) / 10000 AS p99 "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def q_agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark percentile ==
    DuckDB quantile_cont, both linear interpolation).  Exact percentile
    is a mergeable sort-based aggregate; at 100 TB swap in
    approx_percentile (t-digest sketch, constant memory) — same plan
    shape, bounded error.  One percentile(col, array(...)) call shares
    a single sorted buffer across all three quantiles (3 separate calls
    sort the group 3x — measured 2.4x slower)."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").alias("ps"))
        .select(
            "l_returnflag",
            quantize(F.col("ps")[0], 4).alias("p50"),
            quantize(F.col("ps")[1], 4).alias("p90"),
            quantize(F.col("ps")[2], 4).alias("p99"),
        )
    )


@query(
    "q_agg_grouping_sets",
    oracle=(
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt, "
        "CAST(grouping(l_returnflag) AS INT) AS g_rf, "
        "CAST(grouping(l_linestatus) AS INT) AS g_ls "
        "FROM lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
    ),
)
def q_agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (beyond rollup/cube) with grouping()
    indicator columns — one aggregation pass, grouping-set expansion in
    the aggregate operator.  Runs through the SQL door so the text is
    shared with the oracle."""
    Catalog(spark, sf_dir).register_views()
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt, "
        "CAST(grouping(l_returnflag) AS INT) AS g_rf, "
        "CAST(grouping(l_linestatus) AS INT) AS g_ls "
        "FROM lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
    )


@query(
    "q_agg_pivot",
    oracle=(
        "SELECT l_returnflag, "
        "count(*) FILTER (WHERE l_linestatus = 'F') AS F, "
        "count(*) FILTER (WHERE l_linestatus = 'O') AS O "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def q_agg_pivot(spark, sf_dir):
    """Pivot (cross-tab): one pass, no per-value scans — the explicit
    value list keeps the plan static (a dynamic pivot needs a first
    pass to collect values; avoid at scale)."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .count()
        .na.fill(0, ["F", "O"])
    )


@query(
    "q_agg_listagg",
    oracle=(
        "SELECT l_returnflag, "
        "array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses, "
        "count(*) AS cnt FROM lineitem GROUP BY l_returnflag"
    ),
)
def q_agg_listagg(spark, sf_dir):
    """Collect-and-join aggregate (LISTAGG/string_agg analog): the
    collected set is per-group bounded (distinct statuses), so it's
    shuffle-safe; sorted before joining for determinism."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.count(F.lit(1)).alias("cnt"),
    )


@query(
    "q_agg_avg_stddev",
    oracle=(
        "SELECT l_returnflag, floor((avg(l_quantity)) * 1000000 + 0.5) / 1000000 AS avg_qty, "
        "floor((stddev_samp(l_quantity)) * 1000000 + 0.5) / 1000000 AS sd_qty, "
        "floor((var_samp(l_quantity)) * 1000000 + 0.5) / 1000000 AS var_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def q_agg_avg_stddev(spark, sf_dir):
    """Moment aggregates (derivable from the reference's sum/cnt model)."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        ratio(F.avg("l_quantity")).alias("avg_qty"),
        ratio(F.stddev_samp("l_quantity")).alias("sd_qty"),
        ratio(F.var_samp("l_quantity")).alias("var_qty"),
    )


@query(
    "q_agg_filtered",
    oracle=(
        "SELECT l_returnflag, "
        "CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk, "
        "floor((sum(CASE WHEN l_discount >= 0.05 THEN l_extendedprice ELSE 0.0 END)) * 100 + 0.5) / 100 AS disc_rev, "
        "CAST(count(*) AS BIGINT) AS n_all "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def q_agg_filtered(spark, sf_dir):
    """Conditional (filtered) aggregation — several differently-filtered
    measures in ONE scan/shuffle instead of one query per predicate.
    CASE-based form (not FILTER syntax) so the empty-group semantics
    are identical in both engines; partial aggregation applies as
    usual, so only per-group partials cross the network."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bulk"),
        money(
            F.sum(
                F.when(F.col("l_discount") >= 0.05, F.col("l_extendedprice")).otherwise(
                    F.lit(0.0)
                )
            )
        ).alias("disc_rev"),
        F.count(F.lit(1)).alias("n_all"),
    )
