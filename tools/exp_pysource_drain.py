#!/usr/bin/env python
"""Profile q_stream_python_source's drain (VERDICT r8 item 6).

Runs the query end-to-end at sf0.1, then dumps per-micro-batch
durationMs breakdowns from recentProgress plus wall-clock phases
(start->first progress, drain loop, stop, final agg) so the idle
component is visible.  Prints one JSON line.
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

from pyspark.sql import functions as F  # noqa: E402

from skyhookdb_ceph_spark.queries.scans import _scratch_dir  # noqa: E402
from skyhookdb_ceph_spark.session import get_spark  # noqa: E402
from skyhookdb_ceph_spark.sources.skyhook_source import register  # noqa: E402


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="exp_pysrc", shuffle_partitions=8)
    spark.range(1).collect()
    register(spark)
    if "--prewarm" in sys.argv:
        # Pay the session-level Python-datasource worker cold-start on
        # a 1-chunk BATCH read before the stream starts.
        t = time.perf_counter()
        spark.read.format("skyhook").option(
            "path", f"{sf}/events.parquet"
        ).option("chunks", "1").load().count()
        print(
            f"prewarm batch read: "
            f"{round((time.perf_counter() - t) * 1000, 1)} ms",
            file=sys.stderr,
        )
    n_chunks = 4
    stream = (
        spark.readStream.format("skyhook")
        .option("path", f"{sf}/events.parquet")
        .option("columns", "event_type,value")
        .option("chunks", str(n_chunks))
        .load()
    )
    name = f"prof_{uuid.uuid4().hex[:12]}"
    tmp = tempfile.mkdtemp(prefix="skyhook_prof_", dir=_scratch_dir())
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    t0 = time.perf_counter()
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", f"{tmp}/ck")
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )
        t_start = time.perf_counter()
        first_progress = None
        deadline = time.time() + 300
        while time.time() < deadline:
            exc = q.exception()
            if exc is not None:
                raise exc
            p = q.lastProgress
            if p and first_progress is None:
                first_progress = time.perf_counter()
            if p and p["sources"] and p["sources"][0]["endOffset"]:
                end = ast.literal_eval(p["sources"][0]["endOffset"])
                if end.get("chunk") == n_chunks:
                    break
            time.sleep(0.1)
        t_drained = time.perf_counter()
        prog = [
            {
                "batchId": p["batchId"],
                "numInputRows": p["numInputRows"],
                "durationMs": p["durationMs"],
            }
            for p in q.recentProgress
        ]
        q.stop()
        q.awaitTermination(60)
        t_stopped = time.perf_counter()
        n = (
            spark.table(name)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .count()
        )
        t_agg = time.perf_counter()
        out = {
            "phases_ms": {
                "start_call": round((t_start - t0) * 1000, 1),
                "start_to_first_progress": round(
                    (first_progress - t_start) * 1000, 1
                )
                if first_progress
                else None,
                "drain_total": round((t_drained - t_start) * 1000, 1),
                "stop": round((t_stopped - t_drained) * 1000, 1),
                "final_agg": round((t_agg - t_stopped) * 1000, 1),
                "total": round((t_agg - t0) * 1000, 1),
            },
            "batches": prog,
            "agg_rows": n,
        }
        print(json.dumps(out))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
