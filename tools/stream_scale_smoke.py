#!/usr/bin/env python
"""Streaming-axis scaling smoke (VERDICT r8 item 5).

Runs the three most expensive streaming suite entries against the
sf0.1 fixture and the gen_scale.py sf0.3 / sf1 fixtures, recording
per-micro-batch wall time AND state-store size from the engine's own
progress events (stateOperators: numRowsTotal / memoryUsedBytes) — the
watermark state-bound claim measured, not asserted.

    python tools/stream_scale_smoke.py [sf_dir ...]

Prints one JSON line per (sf, query) plus a final summary table.
"""

from __future__ import annotations

import ast
import json
import shutil
import sys
import tempfile
import time
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from skyhookdb_ceph_spark.queries.scans import _scratch_dir  # noqa: E402
from skyhookdb_ceph_spark.session import get_spark  # noqa: E402

DIRS = [
    "/root/testdata/sf0.1",
    "/root/repo/.scratch/scale/sf0.3",
    "/root/repo/.scratch/scale/sf1",
]


def _progress_stats(q):
    batches = []
    max_state_rows = 0
    max_state_bytes = 0
    for p in q.recentProgress:
        rows = sum(s["numRowsTotal"] for s in p.get("stateOperators", []))
        mem = sum(
            s.get("memoryUsedBytes", 0) for s in p.get("stateOperators", [])
        )
        max_state_rows = max(max_state_rows, rows)
        max_state_bytes = max(max_state_bytes, mem)
        batches.append(
            {
                "batchId": p["batchId"],
                "inputRows": p["numInputRows"],
                "triggerMs": p["durationMs"].get("triggerExecution"),
                "stateRows": rows,
            }
        )
    return batches, max_state_rows, max_state_bytes


def run_outer_join(spark, sf_dir, how):
    """Instrumented twin of drain_to_memory for the purchase/click
    outer joins — identical confs, but keeps the query handle so
    progress (state size per batch) can be read before stop."""
    from skyhookdb_ceph_spark.queries.streaming_q import (
        _purchase_click_join,
    )
    from pyspark.sql import functions as F

    joined = _purchase_click_join(spark, sf_dir, how).select(
        "purchase_id", "click_id",
        F.coalesce("user_id", "c_user").alias("user_id")
        if how == "fullOuter"
        else F.col("user_id"),
    )
    name = f"smoke_{uuid.uuid4().hex[:10]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    ckpt = tempfile.mkdtemp(prefix="smoke_ck_", dir=_scratch_dir())
    t0 = time.perf_counter()
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", f"{ckpt}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        batches, srows, sbytes = _progress_stats(q)
        out_rows = spark.table(name).count()
        return wall, batches, srows, sbytes, out_rows
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
        )
        shutil.rmtree(ckpt, ignore_errors=True)


def run_python_source(spark, sf_dir):
    from skyhookdb_ceph_spark.sources.skyhook_source import register

    register(spark)
    n_chunks = 4
    stream = (
        spark.readStream.format("skyhook")
        .option("path", f"{sf_dir}/events.parquet")
        .option("columns", "event_type,value")
        .option("chunks", str(n_chunks))
        .load()
    )
    name = f"smoke_{uuid.uuid4().hex[:10]}"
    ckpt = tempfile.mkdtemp(prefix="smoke_ck_", dir=_scratch_dir())
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    t0 = time.perf_counter()
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", f"{ckpt}/ck")
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + 600
        while time.time() < deadline:
            exc = q.exception()
            if exc is not None:
                raise exc
            p = q.lastProgress
            if p and p["sources"] and p["sources"][0]["endOffset"]:
                end = ast.literal_eval(p["sources"][0]["endOffset"])
                if end.get("chunk") == n_chunks:
                    break
            time.sleep(0.1)
        wall = time.perf_counter() - t0
        batches, srows, sbytes = _progress_stats(q)
        q.stop()
        q.awaitTermination(60)
        out_rows = spark.table(name).count()
        return wall, batches, srows, sbytes, out_rows
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(ckpt, ignore_errors=True)


def run_outer_join_bounded(spark, sf_dir, how, n_files=8):
    """The LIVE-shaped replay: events split into n_files time-ordered
    parquet files, admitted one file per micro-batch — the watermark
    advances BETWEEN batches, so state is bounded by (one batch's
    rows + the watermark/interval tail), not the whole corpus.  This
    is the measurement the single-batch AvailableNow replay cannot
    make: there the watermark only moves after the lone data batch,
    so peak state == total input by construction."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from skyhookdb_ceph_spark.streaming.replay import events_stream

    split_dir = tempfile.mkdtemp(prefix="smoke_split_", dir=_scratch_dir())
    t = pq.read_table(f"{sf_dir}/events.parquet")
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    n = t.num_rows
    for i in range(n_files):
        lo, hi = i * n // n_files, (i + 1) * n // n_files
        pq.write_table(t.slice(lo, hi - lo), f"{split_dir}/part-{i:02d}.parquet")
    import os as _os

    for i in range(n_files):  # oldest-first admission order
        _os.utime(f"{split_dir}/part-{i:02d}.parquet", (1000 + i, 1000 + i))

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
        how,
    ).select("purchase_id", "click_id")

    name = f"smoke_{uuid.uuid4().hex[:10]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    ckpt = tempfile.mkdtemp(prefix="smoke_ck_", dir=_scratch_dir())
    t0 = time.perf_counter()
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", f"{ckpt}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        batches, srows, sbytes = _progress_stats(q)
        out_rows = spark.table(name).count()
        return wall, batches, srows, sbytes, out_rows
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(split_dir, ignore_errors=True)


def main() -> int:
    dirs = sys.argv[1:] or DIRS
    spark = get_spark(app_name="stream_scale_smoke", shuffle_partitions=8)
    spark.range(1).collect()
    summary = []
    for d in dirs:
        label = Path(d).name
        jobs = [
            ("q_stream_python_source", lambda: run_python_source(spark, d)),
            (
                "q_stream_outer_join",
                lambda: run_outer_join(spark, d, "leftOuter"),
            ),
            (
                "q_stream_full_outer_join",
                lambda: run_outer_join(spark, d, "fullOuter"),
            ),
            (
                "outer_join_8batch_bounded",
                lambda: run_outer_join_bounded(spark, d, "leftOuter"),
            ),
        ]
        for qname, fn in jobs:
            wall, batches, srows, sbytes, out_rows = fn()
            rec = {
                "sf": label,
                "query": qname,
                "wall_s": round(wall, 2),
                "out_rows": out_rows,
                "max_state_rows": srows,
                "max_state_mb": round(sbytes / 1e6, 2),
                "batches": batches,
            }
            print(json.dumps(rec), flush=True)
            summary.append(rec)
    print("\nsf        query                       wall_s  out_rows"
          "  max_state_rows  max_state_mb")
    for r in summary:
        print(
            f"{r['sf']:8s}  {r['query']:26s} {r['wall_s']:7.2f}"
            f"  {r['out_rows']:8d}  {r['max_state_rows']:14d}"
            f"  {r['max_state_mb']:10.2f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
