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


def test_event_pattern_multi_batch_invariant(spark, sf_small, tmp_path):
    """q_stream_event_pattern's batching-invariance claim: split the
    fixture into 3 files and force one file per micro-batch — the
    drained result must equal the single-batch run AND the batch
    funnel query.  This is what the per-batch recompute + post-drain
    max_by(seq_len) collapse buys."""
    from skyhookdb_ceph_spark.queries.pipeline11 import q_win_event_pattern
    from skyhookdb_ceph_spark.queries.streaming_q import (
        _event_pattern_stream,
        q_stream_event_pattern,
    )
    from skyhookdb_ceph_spark.queries._util import Catalog

    d = str(tmp_path / "ev_split")
    Catalog(spark, sf_small).events.repartition(3).write.parquet(d)
    multi = sorted(
        map(
            tuple,
            _event_pattern_stream(
                spark, d, glob="*.parquet",
                options={"maxFilesPerTrigger": "1"},
            ).collect(),
        )
    )
    single = sorted(
        map(tuple, q_stream_event_pattern(spark, sf_small).collect())
    )
    batch = sorted(map(tuple, q_win_event_pattern(spark, sf_small).collect()))
    assert multi == single == batch and len(batch) > 0


def test_stateful_state_fn_survives_multi_batch(spark, sf_small, tmp_path):
    """_user_state_fn had a latent batch>=2 bug (GroupState.get is a
    property; calling it raised TypeError) that single-batch drains
    never hit — force a 3-batch replay through the same state fn and
    check the final per-user state equals the batch aggregate."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from skyhookdb_ceph_spark.queries._util import Catalog
    from skyhookdb_ceph_spark.queries.streaming_q import (
        _STATE_OUT_SCHEMA,
        _STATE_SCHEMA,
        _user_state_fn,
    )
    from skyhookdb_ceph_spark.streaming.replay import events_stream

    d = str(tmp_path / "ev_split_stateful")
    Catalog(spark, sf_small).events.repartition(3).write.parquet(d)
    stream = events_stream(
        spark, d, glob="*.parquet", options={"maxFilesPerTrigger": "1"}
    ).select("user_id", "ts", "value")
    updated = stream.groupBy("user_id").applyInPandasWithState(
        _user_state_fn,
        outputStructType=_STATE_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = drain_to_memory(updated, output_mode="update", state_partitions=4)
    # final state per user = the max-n_events update (monotone growth)
    got = sorted(
        map(
            tuple,
            sink.groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("n_events", "sum_cents"), F.col("n_events")
                ).alias("m")
            )
            .select("user_id", "m.n_events", "m.sum_cents")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            Catalog(spark, sf_small)
            .events.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.floor(F.col("value") * 100))
                .cast("bigint")
                .alias("sum_cents"),
            )
            .collect(),
        )
    )
    assert got == want and len(want) > 0
