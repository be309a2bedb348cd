"""Partitioned/sorted Parquet layout writer (SURVEY.md §2.11).

The reference's value index (SIT_IDX_REC) and RID index let an OSD skip
non-matching rows inside an object [U: cls_tabular.cc —
exec_build_sky_index_op].  Spark's equivalents are layout-time, and
this module is the ingest tool that produces them:

- `partitionBy(key)`  -> partition pruning: a filter on the key reads
  only matching directories (the omap point-lookup analog);
- `sortWithinPartitions(sort_cols)` -> tight Parquet row-group min/max
  stats: range predicates skip whole row groups (the value-index scan
  analog) — at 100 TB this is the difference between reading one
  row group and one table.

tests/test_layout.py asserts the pruning actually happens in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Re-lay out a table partitioned by low-cardinality keys and
    sorted within partitions for row-group stat locality."""
    out = df.repartition(*partition_cols)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
