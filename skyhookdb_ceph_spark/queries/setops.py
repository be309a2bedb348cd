"""Set operations (SURVEY.md §2.7) — [EXT], absent in the reference.

UNION ALL is free (no shuffle — partitions concatenate); INTERSECT /
EXCEPT shuffle on the full row, so at scale project to the key columns
first (done below).
"""

from __future__ import annotations

from skyhookdb_ceph_spark.queries._util import Catalog, F
from skyhookdb_ceph_spark.registry import query


@query(
    "q_set_union",
    oracle=(
        "SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer "
        "UNION ALL "
        "SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier"
    ),
)
def q_set_union(spark, sf_dir):
    c = Catalog(spark, sf_dir)
    a = c.customer.select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    b = c.supplier.select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return a.unionByName(b)


@query(
    "q_set_intersect",
    oracle=(
        "SELECT c_nationkey AS nationkey FROM customer "
        "INTERSECT "
        "SELECT s_nationkey AS nationkey FROM supplier"
    ),
)
def q_set_intersect(spark, sf_dir):
    """Nations that have both customers and suppliers (INTERSECT is
    set-semantics: distinct output)."""
    c = Catalog(spark, sf_dir)
    return c.customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        c.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "q_set_except",
    oracle=(
        "SELECT c_nationkey AS nationkey FROM customer "
        "EXCEPT "
        "SELECT s_nationkey AS nationkey FROM supplier"
    ),
)
def q_set_except(spark, sf_dir):
    """Nations with customers but no suppliers."""
    c = Catalog(spark, sf_dir)
    return c.customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        c.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "q_set_intersect_all",
    oracle=(
        "SELECT event_type AS et FROM events WHERE value > 50 "
        "INTERSECT ALL "
        "SELECT event_type AS et FROM events WHERE value > 80"
    ),
)
def q_set_intersect_all(spark, sf_dir):
    """Multiset INTERSECT ALL — each value appears min(count_a,
    count_b) times, the bag semantics INTERSECT's distinct collapses.
    Catalyst rewrites it as a per-row-count min via aggregate +
    generate (no row ever compared pairwise); shuffle is on the full
    projected row, so project FIRST at scale (done: 1 column)."""
    e = Catalog(spark, sf_dir).events
    a = e.filter(F.col("value") > 50).select(F.col("event_type").alias("et"))
    b = e.filter(F.col("value") > 80).select(F.col("event_type").alias("et"))
    return a.intersectAll(b)


@query(
    "q_set_except_all",
    oracle=(
        "SELECT event_type AS et FROM events WHERE value > 50 "
        "EXCEPT ALL "
        "SELECT event_type AS et FROM events WHERE value > 80"
    ),
)
def q_set_except_all(spark, sf_dir):
    """Multiset EXCEPT ALL — each value appears count_a - count_b
    times (floored at 0): the 'what remains after removing one
    occurrence per match' semantics dedup ledgers need, which
    set-EXCEPT destroys.  Same aggregate+generate rewrite class as
    INTERSECT ALL; 1-column projection before the shuffle."""
    e = Catalog(spark, sf_dir).events
    a = e.filter(F.col("value") > 50).select(F.col("event_type").alias("et"))
    b = e.filter(F.col("value") > 80).select(F.col("event_type").alias("et"))
    return a.exceptAll(b)
