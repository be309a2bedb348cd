#!/usr/bin/env python
"""Round-12 STREAMING scale smoke (r11 verdict item 6): per-batch
latency + state-store size for the five true-readStream stateful
pipelines across 1x / 10x / 100x event replays (sf0.1 / sf1 / sf10
gen_scale fixtures), measured from the ENGINE'S OWN telemetry
(StreamingQueryProgress.stateOperators: numRowsTotal /
memoryUsedBytes, durationMs.triggerExecution) via the
replay.PROGRESS_CAPTURE hook — the state-bound claims measured, not
asserted.

Every pipeline replays MULTI-BATCH (events split into 8 time-ordered
files, maxFilesPerTrigger=1) so the watermark advances BETWEEN
batches and eviction actually runs — a single AvailableNow batch
would hold peak state == total input by construction.

Streams:
  q_stream_event_eviction  — watermark-evicting CEP (state must
                             PLATEAU vs its accumulate-forever twin)
  q_stream_event_pattern   — the accumulate-forever twin (state must
                             grow ~linearly in events: the contrast)
  q_stream_chained_windows — two stacked stateful aggs, hour -> day
  q_stream_outer_join      — interval left-outer join, 10-min
                             watermark both sides
  q_stream_dedup_lsh       — LSH admission gate (ZERO streaming
                             state expected at every scale)

    python tools/stream_scale_smoke_r12.py [sf_dir ...]

One JSON line per (sf, stream); BASELINE.md §M records the table.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from skyhookdb_ceph_spark.session import get_spark  # noqa: E402
from skyhookdb_ceph_spark.streaming import replay  # noqa: E402

DIRS = [
    "/root/testdata/sf0.1",
    "/root/repo/.scratch/scale/sf1",
    "/root/repo/.scratch/scale/sf10",
]
N_FILES = 8


def split_events(sf_dir: str) -> str:
    """events.parquet -> 8 time-ordered files (oldest first by mtime
    so the file source admits them in event-time order)."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from skyhookdb_ceph_spark.queries.scans import _scratch_dir

    out = tempfile.mkdtemp(prefix="ssmoke_split_", dir=_scratch_dir())
    t = pq.read_table(f"{sf_dir}/events.parquet")
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    n = t.num_rows
    for i in range(N_FILES):
        lo, hi = i * n // N_FILES, (i + 1) * n // N_FILES
        p = f"{out}/part-{i:02d}.parquet"
        pq.write_table(t.slice(lo, hi - lo), p)
        os.utime(p, (1000 + i, 1000 + i))
    return out


def capture_stats():
    """Reduce the captured progress events to the §M row."""
    batches = []
    max_rows = 0
    max_bytes = 0
    for rec in replay.PROGRESS_CAPTURE or []:
        for p in rec["progress"]:
            if isinstance(p, str):
                p = json.loads(p)
            srows = sum(
                s.get("numRowsTotal", 0)
                for s in p.get("stateOperators", [])
            )
            sbytes = sum(
                s.get("memoryUsedBytes", 0)
                for s in p.get("stateOperators", [])
            )
            max_rows = max(max_rows, srows)
            max_bytes = max(max_bytes, sbytes)
            batches.append(
                {
                    "batch": p.get("batchId"),
                    "in_rows": p.get("numInputRows"),
                    "trigger_ms": (p.get("durationMs") or {}).get(
                        "triggerExecution"
                    ),
                    "state_rows": srows,
                }
            )
    return batches, max_rows, max_bytes


def outer_join_stream(spark, split_dir):
    """Interval left-outer purchase/click join over the split replay —
    same shape as q_stream_outer_join, multi-batch admission."""
    from pyspark.sql import functions as F

    from skyhookdb_ceph_spark.streaming.replay import (
        drain_to_memory,
        events_stream,
    )

    base = events_stream(
        spark, split_dir, glob="*.parquet",
        options={"maxFilesPerTrigger": "1"},
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", "10 minutes")
    clicks = base.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", "10 minutes")
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select("purchase_id", "click_id")
    return drain_to_memory(joined, output_mode="append")


def main() -> int:
    dirs = sys.argv[1:] or DIRS
    spark = get_spark(
        app_name="stream_scale_smoke_r12", shuffle_partitions=8
    )
    spark.range(1).collect()

    from skyhookdb_ceph_spark.queries.streaming_q import (
        _chained_windows_stream,
        _dedup_lsh_pipeline,
        _event_eviction_stream,
        _event_pattern_stream,
    )

    mfpt = {"maxFilesPerTrigger": "1"}
    for d in dirs:
        label = Path(d).name
        split = split_events(d)
        jobs = [
            (
                "q_stream_event_eviction",
                lambda: _event_eviction_stream(
                    spark, split, glob="*.parquet", options=mfpt
                ).collect(),
            ),
            (
                "q_stream_event_pattern",
                lambda: _event_pattern_stream(
                    spark, split, glob="*.parquet", options=mfpt
                ).collect(),
            ),
            (
                "q_stream_chained_windows",
                lambda: _chained_windows_stream(
                    spark, split, glob="*.parquet", options=mfpt
                ).collect(),
            ),
            (
                "q_stream_outer_join",
                lambda: outer_join_stream(spark, split).collect(),
            ),
            (
                "q_stream_dedup_lsh",
                lambda: _dedup_lsh_pipeline(
                    spark, d, n_files=N_FILES, options=mfpt
                ).collect(),
            ),
        ]
        try:
            for name, fn in jobs:
                replay.PROGRESS_CAPTURE = []
                try:
                    t0 = time.perf_counter()
                    rows = len(fn())
                    wall = time.perf_counter() - t0
                    batches, srows, sbytes = capture_stats()
                    data = [b for b in batches if (b["in_rows"] or 0) > 0]
                    trig = [
                        b["trigger_ms"]
                        for b in data
                        if b["trigger_ms"] is not None
                    ]
                    print(
                        json.dumps(
                            {
                                "sf": label,
                                "stream": name,
                                "wall_s": round(wall, 2),
                                "out_rows": rows,
                                "n_data_batches": len(data),
                                "batch_ms_median": (
                                    sorted(trig)[len(trig) // 2]
                                    if trig
                                    else None
                                ),
                                "batch_ms_max": max(trig) if trig else None,
                                "max_state_rows": srows,
                                "max_state_mb": round(sbytes / 1e6, 2),
                            }
                        ),
                        flush=True,
                    )
                except Exception as exc:  # noqa: BLE001
                    print(
                        json.dumps(
                            {
                                "sf": label,
                                "stream": name,
                                "error": f"{type(exc).__name__}: {exc}"[:300],
                            }
                        ),
                        flush=True,
                    )
                finally:
                    replay.PROGRESS_CAPTURE = None
                spark.catalog.clearCache()
        finally:
            shutil.rmtree(split, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
