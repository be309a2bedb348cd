"""Joins (SURVEY.md §2.3).

Reference: no storage-side join — cross-table composition was
client-side key lookup [P1 "future work"; U: run-query.cc — no join
flag].  Spark provides every algorithm behind one API; what matters at
100 TB is strategy choice per query:

- fact x small dim  -> broadcast hash join (dim ships to every executor,
  NO shuffle of the 100 TB side);
- fact x fact       -> sort-merge on the join key (both sides shuffle
  once; AQE splits skewed keys);
- existence checks  -> semi/anti join (never materializes the payload);
- bounded band predicates -> bucketed equi-join (operators/range_join.py);
- time alignment    -> as-of via union+window (operators/asof.py).

tests/test_plans.py asserts the chosen strategy per query via the
plans/explain.py helpers.
"""

from __future__ import annotations

from pyspark.sql.functions import broadcast

from skyhookdb_ceph_spark.operators.asof import asof_join
from skyhookdb_ceph_spark.operators.range_join import banded_interval_join
from skyhookdb_ceph_spark.queries._util import Catalog, F, money, quantize
from skyhookdb_ceph_spark.registry import query


@query(
    "q_join_inner_hash",
    oracle=(
        "SELECT o_orderstatus, count(*) AS cnt, floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_price "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY o_orderstatus"
    ),
)
def q_join_inner_hash(spark, sf_dir):
    """Equi inner join fact<->orders, then aggregate.  shuffle_hash hint:
    orders is far smaller than lineitem, so hashing the small side beats
    sorting both (no sort phase at all)."""
    c = Catalog(spark, sf_dir)
    return (
        c.lineitem.join(
            c.orders.hint("shuffle_hash"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "inner",
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            money(F.sum("l_extendedprice")).alias("sum_price"),
        )
    )


@query(
    "q_join_broadcast",
    oracle=(
        "SELECT n_name, count(*) AS customer_cnt, floor((sum(c_acctbal)) * 100 + 0.5) / 100 AS sum_bal "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name"
    ),
)
def q_join_broadcast(spark, sf_dir):
    """Small-dim broadcast: nation (25 rows at EVERY scale factor) ships
    to executors; the customer side never shuffles."""
    c = Catalog(spark, sf_dir)
    return (
        c.customer.join(
            broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("customer_cnt"),
            money(F.sum("c_acctbal")).alias("sum_bal"),
        )
    )


@query(
    "q_join_sortmerge",
    oracle=(
        "SELECT l_returnflag, count(*) AS cnt, floor((avg(o_totalprice)) * 10000 + 0.5) / 10000 AS avg_total "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY l_returnflag"
    ),
)
def q_join_sortmerge(spark, sf_dir):
    """Large-large sort-merge (hint('merge')): the 100-TB-safe default —
    both sides spill-safe, skew handled by AQE."""
    c = Catalog(spark, sf_dir)
    return (
        c.lineitem.hint("merge")
        .join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            quantize(F.avg("o_totalprice"), 4).alias("avg_total"),
        )
    )


@query(
    "q_join_left",
    oracle=(
        "SELECT c_custkey, count(o_orderkey) AS order_cnt "
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
        "GROUP BY c_custkey"
    ),
)
def q_join_left(spark, sf_dir):
    """Left outer: customers with zero orders survive with count 0
    (count over a NULL key column skips NULLs in both engines)."""
    c = Catalog(spark, sf_dir)
    return (
        c.customer.join(c.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@query(
    "q_join_right",
    oracle=(
        "SELECT c_custkey, c_name, o_orderkey, o_totalprice "
        "FROM orders RIGHT JOIN customer ON o_custkey = c_custkey"
    ),
)
def q_join_right(spark, sf_dir):
    """Right outer join: every customer survives, orders nullable."""
    c = Catalog(spark, sf_dir)
    return c.orders.join(
        c.customer, F.col("o_custkey") == F.col("c_custkey"), "right"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "q_join_full",
    oracle=(
        "SELECT coalesce(a.k, b.k) AS k, a.order_cnt, b.line_cnt FROM "
        "(SELECT o_orderstatus AS k, count(*) AS order_cnt FROM orders GROUP BY 1) a "
        "FULL JOIN "
        "(SELECT l_returnflag AS k, count(*) AS line_cnt FROM lineitem GROUP BY 1) b "
        "ON a.k = b.k"
    ),
)
def q_join_full(spark, sf_dir):
    """Full outer join over two aggregates; key domains only partially
    overlap ({P,O,F} vs {A,N,R}) so both null sides are exercised."""
    c = Catalog(spark, sf_dir)
    a = c.orders.groupBy(F.col("o_orderstatus").alias("k")).agg(
        F.count(F.lit(1)).alias("order_cnt")
    )
    b = c.lineitem.groupBy(F.col("l_returnflag").alias("k")).agg(
        F.count(F.lit(1)).alias("line_cnt")
    )
    return a.join(b, a["k"] == b["k"], "full").select(
        F.coalesce(a["k"], b["k"]).alias("k"), "order_cnt", "line_cnt"
    )


@query(
    "q_join_semi",
    oracle=(
        "SELECT * FROM customer WHERE c_custkey IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 400000)"
    ),
)
def q_join_semi(spark, sf_dir):
    """Existence semi-join: payload of orders never materializes; only
    the distinct key set crosses the shuffle."""
    c = Catalog(spark, sf_dir)
    big = c.orders.filter(F.col("o_totalprice") > 400000)
    return c.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    )


@query(
    "q_join_anti",
    oracle=(
        "SELECT * FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders)"
    ),
)
def q_join_anti(spark, sf_dir):
    """Anti join: customers with no orders at all."""
    c = Catalog(spark, sf_dir)
    return c.customer.join(
        c.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )


@query(
    "q_join_theta",
    oracle=(
        "SELECT s_suppkey, s_name, p_partkey, p_retailprice "
        "FROM supplier JOIN part ON p_retailprice BETWEEN s_acctbal / 4 "
        "AND s_acctbal / 4 + 20"
    ),
)
def q_join_theta(spark, sf_dir):
    """Non-equi (band) theta join, bucketized: Spark's default plan for
    a band predicate is BroadcastNestedLoopJoin (quadratic once neither
    side broadcasts).  banded_interval_join explodes each supplier's
    [lo, lo+20] interval to its <= 2 covering 20-wide buckets and
    equi-joins on bucket id + residual filter — one hash shuffle,
    linear at any scale (tests/test_plans.py asserts no BNL)."""
    c = Catalog(spark, sf_dir)
    s = c.supplier.select("s_suppkey", "s_name", "s_acctbal")
    p = c.part.select("p_partkey", "p_retailprice")
    lo = F.col("s_acctbal") / 4
    return banded_interval_join(
        p, s, "p_retailprice", lo, lo + 20, width=20.0
    ).select("s_suppkey", "s_name", "p_partkey", "p_retailprice")


@query(
    "q_join_cross",
    oracle=(
        "SELECT r_name, n_name FROM region CROSS JOIN nation"
    ),
)
def q_join_cross(spark, sf_dir):
    """Explicit cartesian product — legitimate ONLY when one side is
    dimension-sized (here 5x25); Spark plans a broadcast nested loop.
    Any fact-side cartesian is a bug, which is why q_join_theta goes
    through the bucketed rewrite instead."""
    c = Catalog(spark, sf_dir)
    return c.region.select("r_name").crossJoin(c.nation.select("n_name"))


@query(
    "q_join_asof",
    oracle=(
        "SELECT p.event_id, p.ts, "
        "(SELECT max(c.ts) FROM events c WHERE c.user_id = p.user_id "
        "AND c.event_type = 'click' AND c.ts <= p.ts) AS last_click_ts "
        "FROM events p WHERE p.event_type = 'purchase'"
    ),
)
def q_join_asof(spark, sf_dir):
    """As-of join: each purchase event aligned to the user's most
    recent click at-or-before it (operators/asof.py union+window
    recipe — one shuffle on user_id, no range explosion).  The oracle
    states the same semantics as a correlated max subquery."""
    c = Catalog(spark, sf_dir)
    e = c.events
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts"), F.col("ts").alias("click_ts")
    )
    return asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_col="click_ts",
        out_col="last_click_ts",
    ).select("event_id", "ts", "last_click_ts")


@query(
    "q_join_multiway",
    oracle=(
        "SELECT r_name, count(*) AS order_cnt, floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS sum_total "
        "FROM region JOIN nation ON r_regionkey = n_regionkey "
        "JOIN customer ON n_nationkey = c_nationkey "
        "JOIN orders ON c_custkey = o_custkey "
        "GROUP BY r_name"
    ),
)
def q_join_multiway(spark, sf_dir):
    """4-way star join orders->customer->nation->region, fully
    declarative: fact first, dims joined with NO hints and pre-pruned
    select lists, so Catalyst broadcasts every dim under the size
    threshold (measured plan: three BroadcastHashJoins fused in one
    whole-stage-codegen pass over the fact scan, single shuffle for
    the final groupBy) and AQE re-decides per-dim at cluster scale.
    Round-2's explicit broadcast(region)⋈broadcast(nation) prefix cost
    an extra broadcast-exchange job and was ~40% slower at sf0.1."""
    c = Catalog(spark, sf_dir)
    return (
        c.orders.select("o_custkey", "o_totalprice")
        .join(
            c.customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            c.nation.select("n_nationkey", "n_regionkey"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            c.region.select("r_regionkey", "r_name"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            money(F.sum("o_totalprice")).alias("sum_total"),
        )
    )
