"""Shared helpers for query modules.

Oracle-parity rules (SURVEY.md §5.2, FIXTURES.md):
- money/double aggregates rounded to 2 decimals on BOTH sides;
- averages/ratios rounded to 6;
- every computed column aliased identically in Spark and oracle SQL;
- top-k always carries a deterministic tie-break key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from skyhookdb_ceph_spark.catalog import Catalog

__all__ = ["Catalog", "F", "money", "ratio", "quantize2", "QUANTIZE2_SQL"]


def money(c: Column) -> Column:
    """Quantize a money-valued aggregate to cents, engine-invariantly.

    Was round(c, 2) — but Spark rounds the shortest decimal repr
    (HALF_UP) while DuckDB rounds the binary double, and aggregate sums
    DO land on half-cent boundaries (q_tpch_q10 found one at sf0.01:
    307843.595 -> .60 vs .59).  floor(x*100+0.5)/100 is pure IEEE and
    identical in both engines; every oracle mirrors it.
    """
    return quantize2(c)


def quantize(c: Column, digits: int) -> Column:
    """Engine-invariant n-digit quantization: floor(x*10^n + 0.5)/10^n
    — pure IEEE ops, bit-identical in Spark and DuckDB (unlike round(),
    whose halfway handling differs between the engines)."""
    scale = 10**digits
    return F.floor(c * scale + F.lit(0.5)) / scale


def ratio(c: Column) -> Column:
    """Quantize an average/ratio to 6 decimals, engine-invariantly."""
    return quantize(c, 6)


def quantize2(c: Column) -> Column:
    """Engine-invariant 2-decimal quantization for PER-ROW computed money.

    Spark's round(double, 2) rounds the shortest decimal representation
    (BigDecimal HALF_UP) while DuckDB rounds the binary double — they
    disagree on half-way values (~0.2% of rows).  floor(x*100 + 0.5)/100
    uses only IEEE-754 ops that both engines execute identically, so the
    result is bit-identical.  Mirror with QUANTIZE2_SQL in the oracle.
    """
    return F.floor(c * 100 + F.lit(0.5)) / 100


QUANTIZE2_SQL = "floor(({expr}) * 100 + 0.5) / 100"
