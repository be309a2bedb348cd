"""Composite TPC-H-shape queries: multi-operator end-to-end pipelines
(scan + pushed filters + multi-join + agg + top-k in one plan).

The reference's published workload is TPC-H lineitem [P1]; these are
the classic composite shapes adapted to the fixture schema (no
partsupp table; o_orderpriority in place of o_shippriority).  They
exercise Catalyst's join reordering + broadcast selection + partial
aggregation on realistic multi-way plans — the query shapes a real
user migrating from the reference runs daily.
"""

from __future__ import annotations

from pyspark.sql.functions import broadcast

from skyhookdb_ceph_spark.queries._util import Catalog, F, money
from skyhookdb_ceph_spark.registry import query


@query(
    "q_tpch_q3",
    oracle=(
        "SELECT l_orderkey, floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue, "
        "CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_date, o_orderpriority "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1995-03-15' AND l_shipdate > TIMESTAMP '1995-03-15' "
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue DESC, o_date, l_orderkey LIMIT 10"
    ),
)
def q_tpch_q3(spark, sf_dir):
    """Q3 shipping-priority shape: segment filter on the dim, date
    bands pushed to both fact scans, 3-way join, grouped revenue,
    top-10.  Plan: pushed filters -> join -> partial/final agg ->
    TakeOrderedAndProject.  The filtered customer side carries NO
    broadcast hint: it is ~1/5 of a table that scales with the corpus,
    so a pinned broadcast OOMs executors at 100 TB — Catalyst picks
    broadcast at bench scale from size stats, AQE re-decides at runtime
    on clusters."""
    c = Catalog(spark, sf_dir)
    cust = c.customer.filter(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1995-03-15").cast("timestamp")
    return (
        c.orders.filter(F.col("o_orderdate") < cutoff)
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            c.lineitem.filter(F.col("l_shipdate") > cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").cast("string").alias("o_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_date", "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q5",
    oracle=(
        "SELECT n_name, floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue "
        "FROM region JOIN nation ON r_regionkey = n_regionkey "
        "JOIN customer ON n_nationkey = c_nationkey "
        "JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey "
        "WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY revenue DESC, n_name"
    ),
)
def q_tpch_q5(spark, sf_dir):
    """Q5 local-supplier-volume shape: 6-way star+snowflake join with
    the local-supplier constraint (s_nationkey = n_nationkey) — the
    join-reordering stress test.  Only the BOUNDED dims (region 5
    rows, nation 25 rows by schema contract) carry broadcast hints —
    supplier and customer scale with the corpus, so their join
    strategy is left to Catalyst stats + AQE (broadcast at bench
    scale, shuffle at 100 TB)."""
    c = Catalog(spark, sf_dir)
    return (
        broadcast(c.region.filter(F.col("r_name") == "ASIA"))
        .join(broadcast(c.nation), F.col("r_regionkey") == F.col("n_regionkey"))
        .join(c.customer, F.col("n_nationkey") == F.col("c_nationkey"))
        .join(c.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(c.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            c.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("n_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q_tpch_q10",
    oracle=(
        "SELECT c_custkey, c_name, n_name, "
        "floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE l_returnflag = 'R' "
        "AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1996-04-01' "
        "GROUP BY c_custkey, c_name, n_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
)
def q_tpch_q10(spark, sf_dir):
    """Q10 returned-item shape: a quarter of orders x returned lineitems,
    revenue lost per customer, top 20."""
    c = Catalog(spark, sf_dir)
    return (
        c.orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(
            c.lineitem.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
