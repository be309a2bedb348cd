"""Table/column statistics surface (SURVEY.md §2.11 runstats analog).

The reference collects per-object stats to guide selectivity decisions
[U: cls_tabular.cc — exec_runstats_op].  Spark's equivalents:

- `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` feeding the CBO
  (enabled in session.py: spark.sql.cbo.enabled);
- AQE runtime statistics (shuffle sizes) re-planning joins mid-query;
- this module's `column_stats`, the user-facing runstats: one
  aggregation pass emitting one row per column.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col, min, max, cnt, ndv) per requested numeric column — a
    single scan per column batch, partial-aggregated per partition
    exactly like the reference's per-object stats pass."""
    parts = [
        df.agg(
            F.lit(c).alias("col"),
            F.min(c).cast("double").alias("min_val"),
            F.max(c).cast("double").alias("max_val"),
            F.count(c).alias("cnt"),
            F.countDistinct(c).alias("ndv"),
        )
        for c in cols
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def analyze_table(df: DataFrame, name: str) -> None:
    """Register + ANALYZE so the CBO has ndv/min/max for planning."""
    df.createOrReplaceTempView(name)
    df.sparkSession.sql(
        f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS"
    )
