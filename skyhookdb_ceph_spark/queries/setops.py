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
