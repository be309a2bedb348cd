"""Multi-format readers + the ingest job (SURVEY.md §2.1).

Reference: `fbwriter` turns CSV + a schema file into FlatBuffer objects
[U: src/cls/tabular/fbwriter*]; `transform_db_op` re-lays objects out
columnar [U: cls_tabular.cc — exec_transform_db_op].  Here: read any
supported format WITH AN EXPLICIT SCHEMA (the reference's schema-string
discipline — inference only as an opt-in), then write partitioned
Parquet; Spark's columnar layout + partition layout replaces both
reference ops in one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("csv", "json", "parquet", "orc")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """Explicit-schema read of one supported format.  Omitting the
    schema falls back to inference (the reference only infers at CSV
    ingest [U: run-query/fbwriter CSV loader])."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; known: {FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        reader = reader.option("inferSchema", True)
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


def ingest(
    spark: SparkSession,
    src_path: str,
    fmt: str,
    dest_path: str,
    schema: T.StructType | None = None,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
) -> DataFrame:
    """The fbwriter+transform analog: any format in, partitioned/sorted
    Parquet out; returns the re-read result for validation."""
    df = read_table(spark, src_path, fmt, schema)
    writer = df
    if partition_by:
        writer = writer.repartition(*partition_by)
    if sort_by:
        writer = writer.sortWithinPartitions(*sort_by)
    w = writer.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(dest_path)
    return spark.read.parquet(dest_path)
