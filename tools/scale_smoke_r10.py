#!/usr/bin/env python
"""Scaling smoke for the round-10 wave (same protocol as
tools/scale_smoke.py / BASELINE.md §I): run the new scale-design
queries at sf0.1 / sf0.3 / sf1 (gen_scale.py fixtures) and print wall
time + output rows, so time-ratio-vs-rows-ratio goes into BASELINE.md.

    python tools/scale_smoke_r10.py [sf_dir ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from skyhookdb_ceph_spark.registry import load_all  # noqa: E402
from skyhookdb_ceph_spark.session import get_spark  # noqa: E402

FLAGSHIPS = [
    "q_dedup_incremental",   # delta-vs-index LSH admission
    "q_dedup_agreement",     # two LSH pair generators + pair join
    "q_text_rerank",         # BM25 + k-bounded rerank
    "q_win_event_pattern",   # per-user sequence compaction + regex
    "q_vec_ivf_incremental", # layout write + append + census
    "q_join_width_probed",   # probe + co-partitioned join
]

DIRS = [
    "/root/testdata/sf0.1",
    "/root/repo/.scratch/scale/sf0.3",
    "/root/repo/.scratch/scale/sf1",
]


def mat(df):
    return sum(b.num_rows for b in df._collect_as_arrow())  # noqa: SLF001


def main() -> int:
    dirs = sys.argv[1:] or DIRS
    spark = get_spark(app_name="scale_smoke_r10", shuffle_partitions=32)
    spark.range(1).collect()
    specs = load_all()
    out: dict[str, dict[str, dict[str, float]]] = {}
    for d in dirs:
        label = Path(d).name
        if label in out:
            label = d
        out[label] = {}
        for name in FLAGSHIPS:
            fn = specs[name].fn
            rows = mat(fn(spark, d))  # warm (absorbs first-run machinery)
            t = time.perf_counter()
            mat(fn(spark, d))
            dt = time.perf_counter() - t
            out[label][name] = {"sec": round(dt, 2), "rows": rows}
            print(
                f"{label:8s} {name:24s} {dt:7.2f}s  out_rows={rows}",
                flush=True,
            )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
