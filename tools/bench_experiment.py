#!/usr/bin/env python
"""One-off bench experiment: run the 13 headline queries at sf0.1
under a conf variant and print per-query + sum.  Usage:

    python tools/bench_experiment.py '{"spark.shuffle.compress":"false"}' [--prebuild]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from skyhookdb_ceph_spark.registry import load_all  # noqa: E402
from skyhookdb_ceph_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q_scan_full", "q_filter_gt", "q_filter_range_conj", "q_agg_scalar",
    "q_agg_groupby", "q_join_inner_hash", "q_join_multiway", "q_topk",
    "q_win_rank", "q_fn_map_json", "q_sim_knn", "q_stream_tumbling",
    "q_dedup_exact",
]


def mat(df):
    return sum(b.num_rows for b in df._collect_as_arrow())  # noqa: SLF001


def main():
    conf = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    prebuild = "--prebuild" in sys.argv
    base = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.cbo.enabled": "false",
    }
    base.update(conf)
    shuffle = int(base.pop("shuffle_partitions", 8))
    spark = get_spark(
        app_name="bench_exp", shuffle_partitions=shuffle, extra_conf=base
    )
    spark.range(1).collect()
    mat(spark.range(1))
    floor = 1e9
    for _ in range(3):
        t = time.perf_counter()
        mat(spark.range(1))
        floor = min(floor, time.perf_counter() - t)

    specs = load_all()
    sf = "/root/testdata/sf0.1"
    times = {}
    for name in HEADLINE:
        fn = specs[name].fn
        if prebuild:
            df = fn(spark, sf)
            mat(df)
            best = 1e9
            for _ in range(2):
                t = time.perf_counter()
                mat(df)
                best = min(best, time.perf_counter() - t)
        else:
            mat(fn(spark, sf))
            best = 1e9
            for _ in range(2):
                t = time.perf_counter()
                mat(fn(spark, sf))
                best = min(best, time.perf_counter() - t)
        times[name] = round(best, 4)
    out = {
        "conf": conf,
        "prebuild": prebuild,
        "floor_ms": round(floor * 1000, 1),
        "sum": round(sum(times.values()), 4),
        "times": times,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
