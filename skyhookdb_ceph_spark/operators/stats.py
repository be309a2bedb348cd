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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col, min, max, cnt, ndv) per requested numeric column in ONE
    scan: stack() unpivots the columns to (col, val) rows, then a
    single grouped aggregate computes all stats.  The distinct agg is
    partially deduped per partition before the (col, val) shuffle, so
    network volume is ndv-bounded — the same partial-stats-per-object
    shape as the reference's runstats, but N columns per pass instead
    of N passes."""
    stack_args = ", ".join(f"'{c}', CAST({c} AS DOUBLE)" for c in cols)
    stacked = df.select(
        F.expr(f"stack({len(cols)}, {stack_args}) AS (col, val)")
    )
    return stacked.groupBy("col").agg(
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.count("val").alias("cnt"),
        F.countDistinct("val").alias("ndv"),
    )


def analyze_table(df: DataFrame, name: str) -> None:
    """Register + ANALYZE so the CBO has ndv/min/max for planning."""
    df.createOrReplaceTempView(name)
    df.sparkSession.sql(
        f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS"
    )
