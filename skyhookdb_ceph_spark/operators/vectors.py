"""Vector similarity expressions + sign-bucket LSH (SURVEY.md §2.12).

Embedding columns are array<float>.  All math is widened to double in a
FIXED evaluation order (left-to-right fold) so Spark and the DuckDB
oracle produce bit-identical sums before the final round(…, 6).

100 TB design:
- knn vs one query vector: the query vector is a 1-row broadcast; the
  scan is embarrassingly parallel; top-k is TakeOrderedAndProject
  (per-partition heap + driver merge of k rows, never a global sort).
- all-pairs similarity: sign-bucket LSH (axis-aligned random-hyperplane
  family, deterministic: the first `n_bits` dimensions) turns the
  quadratic problem into an equi-join on bucket id; within-bucket pairs
  only.  More bits => smaller buckets; recall is bucket-local by design
  and the oracle computes the identical bucketed semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from skyhookdb_ceph_spark.operators import ensure_parallelism


def dot_expr(a: str, b: str) -> str:
    """Left-to-right double-precision dot product (Catalyst fold)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)), "
        f"cast(0 AS double), (acc, v) -> acc + v)"
    )


def norm_sq_expr(a: str) -> str:
    return dot_expr(a, a)


def cosine_expr(a: str, b: str) -> str:
    return f"({dot_expr(a, b)} / (sqrt({norm_sq_expr(a)}) * sqrt({norm_sq_expr(b)})))"


def sign_bucket_expr(col: str, n_bits: int) -> str:
    """Deterministic LSH bucket id: sign bits of the first n_bits dims."""
    bits = ", ".join(
        f"(CASE WHEN element_at({col}, {i}) >= 0 THEN '1' ELSE '0' END)"
        for i in range(1, n_bits + 1)
    )
    return f"concat({bits})"


def dot_duckdb(a: str, b: str, dim: int = 64) -> str:
    """Oracle twin of dot_expr: explicit double math, sequential sum."""
    return (
        f"list_aggregate(list_transform(generate_series(1, {dim}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )


def cosine_duckdb(a: str, b: str, dim: int = 64) -> str:
    return (
        f"({dot_duckdb(a, b, dim)} / "
        f"(sqrt({dot_duckdb(a, a, dim)}) * sqrt({dot_duckdb(b, b, dim)})))"
    )


def sign_bucket_duckdb(col: str, n_bits: int) -> str:
    return " || ".join(
        f"(CASE WHEN {col}[{i}] >= 0 THEN '1' ELSE '0' END)"
        for i in range(1, n_bits + 1)
    )


def bucketed_cells(emb: DataFrame, n_bits: int, id_col: str = "vec_id") -> DataFrame:
    """Vectors with their deterministic LSH cell id (IVF coarse
    quantizer analog); at scale, write this out `partitionBy(bucket)`
    so a probe is partition pruning."""
    return ensure_parallelism(emb).selectExpr(
        id_col, "embedding", f"{sign_bucket_expr('embedding', n_bits)} AS bucket"
    )


def bucketed_pairs(emb: DataFrame, n_bits: int, id_col: str = "vec_id") -> DataFrame:
    """(a < b) vector pairs sharing a sign bucket — the LSH equi-join."""
    withb = bucketed_cells(emb, n_bits, id_col)
    a = withb.selectExpr(f"{id_col} AS va", "embedding AS ea", "bucket")
    b = withb.selectExpr(f"{id_col} AS vb", "embedding AS eb", "bucket AS bucket2")
    return a.join(b, (a.bucket == b.bucket2) & (a.va < b.vb)).select(
        "va", "vb", "ea", "eb"
    )
