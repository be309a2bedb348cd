#!/usr/bin/env python
"""Scaling smoke, one decade further (r10 verdict item 3): the heavy
operator family at sf0.1 / sf1 / sf3 / sf10 (gen_scale.py fixtures —
rows grow 10× / 30× / 100× over sf0.1).  Same §I protocol: one
session, warm run absorbed per (query, sf), one timed run; prints one
JSON line per measurement as it lands (partial progress is usable).

Also derives the IVF probe-fraction trajectory per sf from the SAME
planner math the queries use (operators/vectors.scaled_bits_py): nb
grows with log(corpus), cells = 2^nb, and a fixed-size probe set must
be a FALLING fraction of cells — the verdict's q_vec_ivf_* watch item.

    python tools/scale_smoke_r11.py [sf_dir ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from skyhookdb_ceph_spark.registry import load_all  # noqa: E402
from skyhookdb_ceph_spark.session import get_spark  # noqa: E402

BATCH_FLAGSHIPS = [
    "q_dedup_incremental",    # delta-vs-index LSH admission
    "q_dedup_agreement",      # two LSH pair generators + pair join
    "q_text_rerank",          # BM25 + k-bounded rerank
    "q_win_event_pattern",    # per-user sequence compaction + regex
    "q_vec_ivf_incremental",  # layout write + append + census
    "q_graph_triangles",      # capped wedge-close count
    "q_maint_recluster",      # two layout writes + file manifests
    "q_scan_shared",          # N screens, one pass
]
STREAM_FLAGSHIPS = [
    "q_stream_event_pattern",   # accumulate-forever CEP
    "q_stream_event_eviction",  # watermark-evicting CEP twin
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
    spark = get_spark(app_name="scale_smoke_r11", shuffle_partitions=32)
    specs = load_all()

    import pyarrow.parquet as pq

    from skyhookdb_ceph_spark.operators.vectors import scaled_bits_py

    for d in dirs:
        n_emb = pq.ParquetFile(f"{d}/embeddings.parquet").metadata.num_rows
        nb = scaled_bits_py(n_emb)
        print(
            json.dumps(
                {
                    "sf_dir": d,
                    "ivf_planner": {
                        "n_embeddings": n_emb,
                        "n_bits": nb,
                        "cells": 2**nb,
                        # the banded probe reads a FIXED number of
                        # cells per query (primary + band neighbors);
                        # fraction of the directory touched:
                        "probe_fraction_1cell": round(1.0 / 2**nb, 5),
                    },
                }
            ),
            flush=True,
        )

    for name in BATCH_FLAGSHIPS + STREAM_FLAGSHIPS:
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
