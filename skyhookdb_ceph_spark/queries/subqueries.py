"""Subquery surface (SQL door parity): the same ANSI SQL text runs on
Spark (via registered views) and the DuckDB oracle — proving the
engine's SQL entry point handles correlated/scalar subqueries, which
Catalyst decorrelates into joins (SURVEY.md §4 row 11).
"""

from __future__ import annotations

from skyhookdb_ceph_spark.queries._util import Catalog
from skyhookdb_ceph_spark.registry import query

_EXISTS_SQL = (
    "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)"
)


@query("q_subquery_exists", oracle=_EXISTS_SQL)
def q_subquery_exists(spark, sf_dir):
    """Correlated EXISTS — Catalyst rewrites to a left-semi join (no
    per-row re-execution); IDENTICAL SQL text on both engines."""
    Catalog(spark, sf_dir).register_views()
    return spark.sql(_EXISTS_SQL)


_SCALAR_SQL = (
    "SELECT o_orderkey, o_totalprice FROM orders "
    "WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)"
)


@query("q_subquery_scalar", oracle=_SCALAR_SQL)
def q_subquery_scalar(spark, sf_dir):
    """Scalar subquery threshold — planned as a broadcast of the 1-row
    aggregate, one scan each side."""
    Catalog(spark, sf_dir).register_views()
    return spark.sql(_SCALAR_SQL)


_IN_SQL = (
    "SELECT s_suppkey, s_name FROM supplier WHERE s_nationkey IN "
    "(SELECT n_nationkey FROM nation WHERE n_regionkey = 2)"
)


@query("q_subquery_in", oracle=_IN_SQL)
def q_subquery_in(spark, sf_dir):
    """Uncorrelated IN subquery -> semi join on the subquery result."""
    Catalog(spark, sf_dir).register_views()
    return spark.sql(_IN_SQL)
