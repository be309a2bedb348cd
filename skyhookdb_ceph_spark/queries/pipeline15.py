"""Round-13 wave (SURVEY.md §2.25).

Closing the r12 verdict's remaining surface items:

1. q_sql_empty_rollup — the one REAL engine divergence the
   differential fuzzer ever found (r12, grammar v2), promoted from a
   known-divergence branch inside tools/fuzz_differential.compare()
   to a first-class registered artifact: Spark's GROUP BY ROLLUP /
   CUBE over EMPTY input returns 0 rows, while the SQL standard (and
   DuckDB) yield the grand-total row (count 0, aggregates NULL).
   The query ships the production WORKAROUND idiom — union the
   globally-aggregated grand row guarded by `cnt = 0`, which is
   branch-free and correct at ANY input cardinality — and the oracle
   is the plain standard ROLLUP, so the pair pins both the
   divergence and its fix.

House rules unchanged: identical aliases both sides, deterministic
everything, no all-pairs, no corpus-sized collect().
"""

from __future__ import annotations

from pyspark.sql import functions as F

from skyhookdb_ceph_spark.queries._util import Catalog
from skyhookdb_ceph_spark.registry import query

# ---------------------------------------------------------------------------
# §2.25.1 empty-input ROLLUP: the fuzzer-found divergence, pinned
# ---------------------------------------------------------------------------

# Provably-empty predicate: orderkeys are positive, so the filter
# pushes to the parquet scan and prunes every row group — the rollup
# genuinely executes over zero rows, which is the whole point.
_EMPTY_PRED = "o_orderkey < 0"

_EMPTY_ROLLUP_ORACLE = f"""
SELECT o_orderpriority,
  CAST(count(*) AS BIGINT) AS cnt,
  floor(sum(o_totalprice) * 100 + 0.5) / 100 AS sum_price
FROM orders WHERE {_EMPTY_PRED}
GROUP BY ROLLUP(o_orderpriority)
"""


@query(
    "q_sql_empty_rollup",
    oracle=_EMPTY_ROLLUP_ORACLE,
    tags=("sql", "divergence", "fuzz-found"),
)
def q_sql_empty_rollup(spark, sf_dir):
    """The empty-input ROLLUP divergence — the single REAL engine
    difference 14,000 differential-fuzz seeds ever surfaced (round
    12, grammar v2) — pinned as a registered artifact instead of a
    branch inside the fuzzer's compare().

    THE DIVERGENCE (verified by hand, Spark 4.1.2 vs DuckDB 1.x):
    `GROUP BY ROLLUP(a)` / `CUBE(a)` / `GROUPING SETS ((a), ())`
    over an EMPTY input returns **0 rows in Spark**, while the SQL
    standard — and DuckDB, and PostgreSQL — emit the () grouping
    set's GRAND-TOTAL row (count 0, other aggregates NULL), exactly
    as a global aggregate with no GROUP BY does.  Spark implements
    the expanded grouping sets as a regular hash aggregate over an
    Expand node, and a grouped aggregate over zero rows yields zero
    groups — the () set is not special-cased.  Both engines DO agree
    on the plain global aggregate (one row even on empty input).

    THE IDIOM a user needs (shipped here, branch-free, correct at
    ANY input cardinality): union the global aggregate's row, kept
    only when its own count says the input was empty —

        rollup(...)  UNION ALL  global_agg(...) WHERE cnt = 0

    On empty input the rollup contributes nothing and the guarded
    grand row restores the standard's contract; on non-empty input
    the guard drops it and the rollup's own () row already carries
    the grand total — no double counting, no driver-side branching,
    one extra aggregate over an already-pruned scan.  The oracle is
    the plain standard ROLLUP, so the pair certifies the idiom
    reproduces the standard semantics Spark omits.

    Plan note: the empty predicate (`o_orderkey < 0` on a positive
    key) reaches the parquet scan as a PushedFilter, so both the
    rollup and the guard aggregate read row-group statistics and no
    data pages — the idiom's overhead at 100 TB is metadata-only."""
    o = Catalog(spark, sf_dir).orders.filter(_EMPTY_PRED)
    rolled = (
        o.rollup("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.expr(
                "floor(sum(o_totalprice) * 100 + 0.5) / 100"
            ).alias("sum_price"),
        )
        .select("o_orderpriority", "cnt", "sum_price")
    )
    grand = (
        o.agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.expr(
                "floor(sum(o_totalprice) * 100 + 0.5) / 100"
            ).alias("sum_price"),
        )
        .filter("cnt = 0")
        .selectExpr(
            "CAST(NULL AS STRING) AS o_orderpriority", "cnt", "sum_price"
        )
    )
    return rolled.unionByName(grand)
