"""Bucketed band (theta/range) join (SURVEY.md §2.3 q_join_theta).

A band join `point BETWEEN lo AND hi` defaults to
BroadcastNestedLoopJoin in Spark — quadratic once neither side is
broadcastable.  When the band width is bounded, bucketize both sides on
`width`-sized ranges: a point lands in one bucket, an interval of
length <= width spans at most two, so exploding intervals to their
covered buckets turns the theta join into an EQUI-join on bucket id
(+ residual band filter).  Cost: one shuffle on bucket id, linear
output work — survives arbitrary scale-up on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def banded_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo: Column,
    hi: Column,
    width: float,
) -> DataFrame:
    """Join rows of `points` to rows of `intervals` where
    points[point_col] is within [lo, hi] (interval length must be
    <= width for the 2-bucket explosion to stay exact)."""
    bp = points.withColumn("__bucket", F.floor(F.col(point_col) / width))
    bi = (
        intervals.withColumn("__lo", lo)
        .withColumn("__hi", hi)
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(F.floor(F.col("__lo") / width), F.floor(F.col("__hi") / width))
            ),
        )
    )
    return (
        bp.join(bi, "__bucket")
        .filter((F.col(point_col) >= F.col("__lo")) & (F.col(point_col) <= F.col("__hi")))
        .drop("__bucket", "__lo", "__hi")
    )
