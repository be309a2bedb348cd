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

__all__ = ["Catalog", "F", "money", "ratio"]


def money(c: Column) -> Column:
    """Round a money-valued aggregate to cents (FP-order tolerance)."""
    return F.round(c, 2)


def ratio(c: Column) -> Column:
    """Round an average/ratio to 6 decimals (FP-order tolerance)."""
    return F.round(c, 6)
