"""Inverted text index (SURVEY.md §2.11) — the Spark re-expression of
SkyhookDM's per-object text index [U: cls_tabular.cc —
exec_build_sky_index_op; cls_tabular_utils.h — SIT_IDX_TXT].

The reference stores (token -> row offsets) in each object's omap and
consults it before scanning.  Here the index IS a DataFrame/Parquet
dataset (token, doc_id, tf): build once with explode+groupBy (one
shuffle), persist partitioned by token prefix so a keyword lookup scans
exactly one partition (partition pruning = the omap consult).

At 100 TB the index build is a single map+shuffle pass; queries touch
only the pruned partition + a broadcast-sized posting list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_inverted_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(token, doc_id, tf) postings via explode + groupBy."""
    tokens = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
    ).filter(F.col("token") != "")
    return tokens.groupBy("token", id_col).agg(F.count(F.lit(1)).alias("tf"))


def write_index(index: DataFrame, path: str) -> None:
    """Persist partitioned by first token letter: keyword lookups prune
    to one partition (the analog of an omap point lookup)."""
    index.withColumn("tok0", F.substring("token", 1, 1)).write.mode(
        "overwrite"
    ).partitionBy("tok0").parquet(path)


def keyword_search(index: DataFrame, keyword: str, k: int = 20) -> DataFrame:
    """Top-k documents for one keyword, ranked by term frequency.
    The token filter is pushed to the scan; top-k plans as
    TakeOrderedAndProject (no global sort)."""
    return (
        index.filter(F.col("token") == keyword.lower())
        .select("doc_id", "tf")
        .orderBy(F.col("tf").desc(), "doc_id")
        .limit(k)
    )


def search_persisted_index(spark, path: str, keyword: str, k: int = 20) -> DataFrame:
    """Keyword search against an index written by write_index: the
    explicit tok0 predicate makes the lookup a PARTITION PRUNE (one
    directory read out of ~26 — the omap point-lookup analog), then the
    token filter + row-group stats finish inside that partition."""
    kw = keyword.lower()
    idx = spark.read.parquet(path).filter(
        (F.col("tok0") == kw[:1]) & (F.col("token") == kw)
    )
    return (
        idx.select("doc_id", "tf").orderBy(F.col("tf").desc(), "doc_id").limit(k)
    )
