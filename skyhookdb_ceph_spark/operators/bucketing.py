"""Bucketed-table co-located joins (SURVEY.md §4 scale notes).

At 100 TB the dominant cost of a fact-fact join is shuffling both
sides.  Bucketing pre-shuffles at WRITE time: both tables are written
`bucketBy(n, key)` into the catalog, and a join on the bucket key then
plans as SortMergeJoin with NO Exchange on either side — the shuffle
is paid once at ingest and amortized over every subsequent join
(tests/test_bucketing.py asserts the Exchange-free plan).

Bucketing metadata only survives through catalog tables (saveAsTable),
not raw parquet paths; session.py points the warehouse at a scratch
location so local runs stay clean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Write df as a bucketed (and optionally sorted) catalog table."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A dangling managed-table location (catalog lost, files kept, e.g.
    # a previous process) blocks saveAsTable — clear it best-effort.
    # Cleanup is restricted to UNQUALIFIED table names under a verified
    # local file: warehouse: a database-qualified name or remote
    # warehouse URI would make the naive {warehouse}/{name} concat
    # point at the wrong path (round-2 advisory), so those cases skip
    # the scrub rather than guess.
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    if warehouse.startswith("/") and "." not in table:
        import os
        import shutil

        loc = os.path.join(warehouse.rstrip("/"), table.lower())
        if os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


# Per-(session, prefix) name of the most recent scoped table, so a
# re-run within one session drops its own predecessor and nothing else.
_SESSION_SCOPED: dict[tuple[int, str], str] = {}


def write_bucketed_scoped(
    df: DataFrame,
    prefix: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> str:
    """write_bucketed under a PER-RUN unique table name.

    Queries that materialize a shared-catalog artifact as a side
    effect (signature indexes, bucketed layouts) must not reuse a
    fixed name: two sessions sharing a warehouse would clobber each
    other mid-read (round-10 advisory).  A uuid suffix isolates runs;
    the previous table created by THIS session under the same prefix
    is dropped, so repeated invocations don't leak unboundedly, while
    other sessions' tables are never touched.  Returns the name."""
    import uuid

    spark = df.sparkSession
    key = (id(spark), prefix)
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    write_bucketed(df, name, bucket_cols, n_buckets, sort_cols)
    prev = _SESSION_SCOPED.get(key)
    if prev and prev != name:
        spark.sql(f"DROP TABLE IF EXISTS {prev}")
    _SESSION_SCOPED[key] = name
    return name


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
    prefer_merge: bool = True,
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket
    key; with matching bucket specs Spark elides both Exchanges.

    prefer_merge hints SortMergeJoin — on dimension-sized test data the
    planner would otherwise pick a broadcast join and skip the bucketed
    path entirely (at fact-fact scale sort-merge is the default anyway).
    """
    left = spark.table(left_table)
    if prefer_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on=on, how=how)
