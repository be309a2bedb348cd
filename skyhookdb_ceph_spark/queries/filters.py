"""Filters / predicates (SURVEY.md §2.2).

Reference predicate machine: per-column TypedPredicate with op enum
SOT_{lt,gt,eq,ne,leq,geq,like,in,between,logical_and/or/not,...},
';'-chained predicates are conjunctions
[U: cls_tabular_utils.h — SOT_* enum, TypedPredicate, applyPredicates;
 run-query.cc — --select-preds parsing].

Spark mapping: plain Column predicates.  Every one of these compiles to
a pushed Parquet filter (verify: .explain shows PushedFilters) — the
exact analog of the reference evaluating predicates inside the OSD
before any bytes cross the network.  At 100 TB this is the single most
important property: selectivity * 100 TB is what crosses the shuffle.
"""

from __future__ import annotations

from skyhookdb_ceph_spark.queries._util import Catalog, F, quantize2
from skyhookdb_ceph_spark.registry import query


@query("q_filter_gt", oracle="SELECT * FROM lineitem WHERE l_extendedprice > 91400")
def q_filter_gt(spark, sf_dir):
    """Canonical SkyhookDM demo predicate (extendedprice > 91400, [P1])."""
    return Catalog(spark, sf_dir).lineitem.filter(F.col("l_extendedprice") > 91400)


@query(
    "q_filter_eq_point",
    oracle="SELECT * FROM lineitem WHERE l_orderkey = 42 AND l_linenumber = 1",
)
def q_filter_eq_point(spark, sf_dir):
    """Conjunctive equality point query ([U: run-query.cc — query d]).
    With a sorted/partitioned layout this is a row-group-stats skip —
    the analog of the reference's RID/value index lookup."""
    li = Catalog(spark, sf_dir).lineitem
    return li.filter((F.col("l_orderkey") == 42) & (F.col("l_linenumber") == 1))


@query(
    "q_filter_range_conj",
    oracle=(
        "SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ),
)
def q_filter_range_conj(spark, sf_dir):
    """TPC-H Q6-shape range conjunction ([U: run-query.cc — query e])."""
    li = Catalog(spark, sf_dir).lineitem
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )


@query("q_filter_like", oracle="SELECT * FROM part WHERE p_name LIKE '%red%'")
def q_filter_like(spark, sf_dir):
    """LIKE / regex predicate (SOT_like, [U: run-query.cc — query f
    --comment_regex])."""
    return Catalog(spark, sf_dir).part.filter(F.col("p_name").like("%red%"))


@query(
    "q_filter_regex",
    oracle="SELECT * FROM part WHERE regexp_matches(p_name, '^(red|blue) ')",
)
def q_filter_regex(spark, sf_dir):
    """Full regex variant of SOT_like (reference compiles the pattern
    with std::regex/RE2 per scan)."""
    return Catalog(spark, sf_dir).part.filter(F.col("p_name").rlike("^(red|blue) "))


@query(
    "q_filter_in",
    oracle="SELECT * FROM lineitem WHERE l_returnflag IN ('A', 'R')",
)
def q_filter_in(spark, sf_dir):
    return Catalog(spark, sf_dir).lineitem.filter(F.col("l_returnflag").isin("A", "R"))


@query(
    "q_filter_between",
    oracle="SELECT * FROM lineitem WHERE l_quantity BETWEEN 5 AND 15",
)
def q_filter_between(spark, sf_dir):
    return Catalog(spark, sf_dir).lineitem.filter(F.col("l_quantity").between(5, 15))


@query(
    "q_filter_or_not",
    oracle=(
        "SELECT * FROM customer WHERE (c_mktsegment = 'BUILDING' "
        "OR c_mktsegment = 'MACHINERY') AND NOT (c_acctbal < 0)"
    ),
)
def q_filter_or_not(spark, sf_dir):
    """Disjunction + negation (SOT_logical_or / SOT_logical_not)."""
    c = Catalog(spark, sf_dir).customer
    return c.filter(
        ((F.col("c_mktsegment") == "BUILDING") | (F.col("c_mktsegment") == "MACHINERY"))
        & ~(F.col("c_acctbal") < 0)
    )


@query(
    "q_filter_null",
    oracle=(
        "SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_np FROM orders "
        "WHERE nullif(o_orderstatus, 'P') IS NOT NULL"
    ),
)
def q_filter_null(spark, sf_dir):
    """SQL 3-valued NULL semantics (reference: nullbit vector skips the
    row, [U: *.fbs — Record.nullbits]).  Fixtures carry no physical
    NULLs, so NULLIF manufactures them deterministically."""
    o = Catalog(spark, sf_dir).orders
    return o.select(
        "o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_np")
    ).filter(F.col("status_np").isNotNull())


@query(
    "q_filter_null_safe_eq",
    oracle=(
        "SELECT o_orderkey, status_np FROM ("
        "SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_np FROM orders) "
        "WHERE status_np IS NOT DISTINCT FROM NULL "
        "OR status_np IS NOT DISTINCT FROM 'F'"
    ),
)
def q_filter_null_safe_eq(spark, sf_dir):
    """Null-safe equality (<=> / IS NOT DISTINCT FROM): NULL <=> NULL
    is true, unlike ordinary 3VL equality — the predicate that makes
    NULL-keyed joins and dedup well-defined."""
    o = Catalog(spark, sf_dir).orders
    np = F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_np")
    return (
        o.select("o_orderkey", np)
        .filter(
            F.col("status_np").eqNullSafe(F.lit(None).cast("string"))
            | F.col("status_np").eqNullSafe("F")
        )
    )


@query(
    "q_project_compute",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS revenue, "
        "floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100 AS charge "
        "FROM lineitem"
    ),
)
def q_project_compute(spark, sf_dir):
    """Computed projection (arithmetic op surface SOT_add/mul,
    [U: cls_tabular_utils.h — SOT arithmetic in the agg path]).
    Per-row money uses quantize2 (not round): engine-invariant IEEE
    integer-math quantization mirrored exactly in the oracle SQL."""
    li = Catalog(spark, sf_dir).lineitem
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        quantize2(disc).alias("revenue"),
        quantize2(disc * (1 + F.col("l_tax"))).alias("charge"),
    )
