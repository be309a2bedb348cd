"""Skew mitigation via key salting (SURVEY.md §4 scale notes).

A groupBy/join on a skewed key funnels the hot key's rows into one
task.  AQE's skew-join splitting covers sort-merge joins; for
aggregations the classic fix is salting: append a random-ish salt to
the key, aggregate partially per (key, salt), then re-aggregate per
key.  Both phases are map-side-combinable, so the hot key's work is
spread over `n_salts` tasks and the second shuffle carries only
n_salts rows per key.

The salt here is deterministic (hash of a stable row id, mod n_salts)
so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    salt_col: Column,
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(group_cols).agg(sum(value), count(*)) computed via a
    two-phase salted aggregation; algebraically identical to the direct
    aggregate (sum of sums, sum of counts) for any salt assignment."""
    salted = df.withColumn("__salt", F.pmod(F.hash(salt_col), F.lit(n_salts)))
    partial = salted.groupBy(*group_cols, "__salt").agg(
        F.sum(value_col).alias("__psum"),
        F.count(F.lit(1)).alias("__pcnt"),
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__psum").alias(f"sum_{value_col}"),
        F.sum("__pcnt").alias("cnt"),
    )
