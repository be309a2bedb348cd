#!/usr/bin/env python
"""Scaling smoke for the round-11 LATE additions (q_dedup_substring,
q_dedup_minhash_recall) at sf0.1 / sf1 / sf3 (1x / 10x / 30x rows,
gen_scale.py fixtures).  Same §I protocol as scale_smoke_r11.py: one
session, warm run absorbed per (query, sf), one timed run, one JSON
line per measurement.

Expectations being tested:
- q_dedup_substring: positions grow linearly with corpus chars, so
  wall time must stay at-or-below linear (groupBy + equi-join +
  doc-bounded window — no pairwise stage anywhere).
- q_dedup_minhash_recall: the audit sample is corpus-scaled to ~5000
  docs (doc_id % max(1, n//5000) = 0), so wall time must PLATEAU, not
  grow — the whole point of the sampled-audit design.

    python tools/scale_smoke_r11b.py [sf_dir ...]
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
    "q_dedup_substring",
    "q_dedup_minhash_recall",
    "q_stream_dedup_lsh",  # static index build is corpus-sized (linear);
    # per-batch stream work is delta-sized
]

DIRS = [
    "/root/testdata/sf0.1",
    "/root/repo/.scratch/scale/sf1",
    "/root/repo/.scratch/scale/sf3",
]


def mat(df):
    return sum(b.num_rows for b in df._collect_as_arrow())  # noqa: SLF001


def main() -> None:
    dirs = sys.argv[1:] or DIRS
    spark = get_spark(app_name="scale_smoke_r11b", shuffle_partitions=32)
    specs = load_all()
    for name in FLAGSHIPS:
        fn = specs[name].fn
        for d in dirs:
            try:
                t0 = time.perf_counter()
                mat(fn(spark, d))  # warm (absorbs one-time init)
                warm = time.perf_counter() - t0
                t0 = time.perf_counter()
                rows = mat(fn(spark, d))
                timed = time.perf_counter() - t0
                # session hygiene: drop persisted intermediates so a
                # later (query, sf) isn't taxed by accumulated cache
                # (measured: 311.7 vs 213.7 s fresh, BASELINE.md §L.6)
                spark.catalog.clearCache()
                print(
                    json.dumps(
                        {
                            "query": name,
                            "sf_dir": d,
                            "sec": round(timed, 2),
                            "warm_sec": round(warm, 2),
                            "rows": rows,
                        }
                    ),
                    flush=True,
                )
            except Exception as exc:  # noqa: BLE001
                print(
                    json.dumps(
                        {
                            "query": name,
                            "sf_dir": d,
                            "error": f"{type(exc).__name__}: {exc}"[:300],
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
