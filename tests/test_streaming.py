"""Streaming parity: the batch-checked window aggregations must run
UNCHANGED under readStream and produce identical results — the claim
that makes the batch-twin oracle checks meaningful."""

from __future__ import annotations

from pyspark.sql import functions as F

from skyhookdb_ceph_spark.queries.streaming_q import q_stream_tumbling
from skyhookdb_ceph_spark.streaming.replay import drain_to_memory, events_stream


def _tumbling_agg(df):
    return (
        df.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "cnt",
        )
    )


def test_tumbling_window_identical_in_batch_and_stream(spark, sf_small):
    batch = sorted(map(tuple, q_stream_tumbling(spark, sf_small).collect()))
    streamed = drain_to_memory(
        _tumbling_agg(events_stream(spark, sf_small)), output_mode="complete"
    )
    assert sorted(map(tuple, streamed.collect())) == batch


def test_stream_drain_is_repeatable(spark, sf_small):
    out1 = drain_to_memory(
        _tumbling_agg(events_stream(spark, sf_small)), output_mode="complete"
    ).count()
    out2 = drain_to_memory(
        _tumbling_agg(events_stream(spark, sf_small)), output_mode="complete"
    ).count()
    assert out1 == out2 > 0
