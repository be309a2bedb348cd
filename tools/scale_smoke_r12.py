#!/usr/bin/env python
"""Round-12 scaling smoke (r11 verdict item 3): decade evidence for
the heavy families §L.1/§L.6 did NOT yet cover — the graph pair
(components, pagerank), the IVF build/read trio (build,
files_pruned, knn over the persisted layout), the raw LSH pair
generator (q_dedup_fuzzy — the base of every corpus dedup op), and
this round's two new heavy ops (q_transform_dedup_corpus,
q_pipeline_e2e_v2, whose span-census branch carries the substring
shuffle).  sf0.1 / sf1 / sf3 / sf10 = 1x / 10x / 30x / 100x rows
(gen_scale.py fixtures, §I protocol: one session, warm run absorbed
per (query, sf), one timed run, clearCache between measurements).

    python tools/scale_smoke_r12.py [sf_dir ...]
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
    "q_graph_components",       # min-label fixpoint over co-occurrence
    "q_graph_pagerank",         # fixed-iteration rank over same graph
    "q_vec_ivf_build",          # coarse quantize + partitionBy layout
    "q_vec_ivf_files_pruned",   # directory-pruned probe over layout
    "q_sim_knn_ivf",            # end-to-end IVF kNN (build + probe)
    "q_dedup_fuzzy",            # the raw banded-LSH pair generator
    "q_transform_dedup_corpus", # NEW: labels + survivor window
    "q_pipeline_e2e_v2",        # NEW: 2-scan pipeline w/ span census
]

DIRS = [
    "/root/testdata/sf0.1",
    "/root/repo/.scratch/scale/sf1",
    "/root/repo/.scratch/scale/sf3",
    "/root/repo/.scratch/scale/sf10",
]


def mat(df):
    return sum(b.num_rows for b in df._collect_as_arrow())  # noqa: SLF001


def main() -> None:
    dirs = sys.argv[1:] or DIRS
    spark = get_spark(app_name="scale_smoke_r12", shuffle_partitions=32)
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
