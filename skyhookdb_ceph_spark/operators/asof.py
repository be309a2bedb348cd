"""As-of (nearest-timestamp) join (SURVEY.md §2.3 q_join_asof).

Spark SQL has no ASOF JOIN; the scalable recipe is the union+window
trick: tag both sides, union on (key, ts), and carry the right side's
value forward with last(..., ignorenulls) over a per-key window.  Cost
= ONE shuffle on the key + per-partition sort — the same envelope as a
groupBy, with no range explosion and no nested loop, at any scale.
Skewed keys are split by AQE like any other sort/window stage.

Tie semantics: a right-side row at exactly left.ts qualifies
(`<=` as-of), implemented by sorting right rows before left rows at
equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """For each left row, attach the greatest right.{right_ts}'s
    {value_col} with right_ts <= left_ts within the same {key}.

    Returns all left columns + {out_col} (null when no right row
    precedes the left row).
    """
    lcols = left.columns
    tagged_left = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__val", F.lit(None).cast(right.schema[value_col].dataType)
    )
    tagged_right = (
        right.select(
            F.col(key),
            F.col(right_ts).alias(left_ts),
            F.col(value_col).alias("__val"),
        )
        .withColumn("__is_left", F.lit(0))
    )
    for c in lcols:
        if c not in tagged_right.columns:
            tagged_right = tagged_right.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    unioned = tagged_left.unionByName(tagged_right.select(tagged_left.columns))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(left_ts), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        unioned.withColumn(out_col, F.last("__val", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
        .select(*lcols, out_col)
    )
