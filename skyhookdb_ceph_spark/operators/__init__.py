"""Reusable operator library (custom ops Spark lacks as built-ins).

Each module implements one family as compositions of DataFrame
operations — no driver-side loops, no row-at-a-time Python UDFs:

- minhash.py    — shingling + banded MinHash LSH (fuzzy dedup)
- simhash.py    — SimHash bit-signature clustering
- vectors.py    — cosine/dot expressions + sign-bucket LSH for ANN
- text_index.py — inverted text index (reference IDX_TXT analog)
- asof.py       — as-of (nearest-timestamp) join
- range_join.py — bucketed band/theta join (no nested-loop)
- multimodal.py — opaque-binary columns + Arrow-batched decode plumbing
- layout.py     — partitioned/sorted Parquet writer (IDX_REC analog)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Spread a narrow input across the cluster before CPU-heavy
    per-row work (hashing, vector math).

    A small fixture is one Parquet split -> ONE task, serializing work
    that should use every core; at 100 TB inputs have thousands of
    splits and this is a no-op (the repartition only fires when the
    current partition count is below the default parallelism), so the
    extra shuffle is never paid when the data is already wide.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


class GlobalWindowScaleError(RuntimeError):
    """Raised when an unpartitioned window is asked to sort more rows
    than one task should ever hold."""


def guard_global_window(df: DataFrame, max_rows: int = 10_000_000) -> DataFrame:
    """Enforce the dimension-only restriction on unpartitioned windows.

    An `OVER (ORDER BY …)` with no PARTITION BY plans a single-task
    global sort — the first executor OOM at fact-table scale.  Callers
    that genuinely need global ranking on big data should use the
    percentile-boundary + broadcast formulation (q_win_quartile_scalable).
    The count here is a cheap aggregate job (column-pruned scan), and
    at 100 TB failing fast beats an OOM hours into the stage.  Set
    SPARK_GRAFT_ALLOW_GLOBAL_WINDOW=1 to override.
    """
    import os

    if os.environ.get("SPARK_GRAFT_ALLOW_GLOBAL_WINDOW") == "1":
        return df
    n = df.count()
    if n > max_rows:
        raise GlobalWindowScaleError(
            f"unpartitioned window over {n} rows (> {max_rows}): this is a "
            "single-task global sort; use the percentile-boundary pattern "
            "(q_win_quartile_scalable) or set SPARK_GRAFT_ALLOW_GLOBAL_WINDOW=1"
        )
    return df
