"""SimHash near-duplicate signatures (SURVEY.md §2.12).

SimHash projects each token onto N pseudo-random hyperplanes (here: N
hex digits of the token's md5 — bit i is +1 if digit i <= '7' else -1),
sums the projections over the document, and keeps the sign vector.
Near-identical documents get identical signatures, so dedup is a single
groupBy(simhash) — one shuffle on a short string key, O(n) at any scale
(vs O(n^2) pairwise comparison).

md5-based projection keeps it deterministic AND byte-identical in the
DuckDB oracle; `oracle_sql()` mirrors the exact expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from skyhookdb_ceph_spark.operators import ensure_parallelism

N_BITS = 16  # one bit per md5 hex digit position


def _bit_spark(i: int, words: str) -> str:
    return (
        f"(CASE WHEN aggregate({words}, 0, (acc, w) -> acc + "
        f"(CASE WHEN substring(md5(w), {i}, 1) <= '7' THEN 1 ELSE -1 END)) >= 0 "
        f"THEN '1' ELSE '0' END)"
    )


def _bit_duckdb(i: int, words: str) -> str:
    return (
        f"(CASE WHEN list_aggregate(list_transform({words}, w -> "
        f"(CASE WHEN substr(md5(w), {i}, 1) <= '7' THEN 1 ELSE -1 END)), 'sum') >= 0 "
        f"THEN '1' ELSE '0' END)"
    )


def simhash_spark_expr(text_col: str = "text", n_bits: int = N_BITS) -> str:
    words = f"split({text_col}, ' ')"
    bits = ", ".join(_bit_spark(i, words) for i in range(1, n_bits + 1))
    return f"concat({bits})"


def simhash_duckdb_expr(text_col: str = "text", n_bits: int = N_BITS) -> str:
    words = f"string_split({text_col}, ' ')"
    bits = " || ".join(_bit_duckdb(i, words) for i in range(1, n_bits + 1))
    return bits


def simhash_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group documents by SimHash signature: (simhash, cnt, keep_doc).
    cnt > 1 rows are near-duplicate clusters; keep_doc = the survivor."""
    return (
        ensure_parallelism(docs)
        .selectExpr(id_col, f"{simhash_spark_expr(text_col)} AS simhash")
        .groupBy("simhash")
        .agg({"*": "count", id_col: "min"})
        .selectExpr("simhash", "`count(1)` AS cnt", f"`min({id_col})` AS keep_doc")
    )
