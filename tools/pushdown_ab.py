#!/usr/bin/env python
"""Pushdown A/B — the reference's `--use-cls` on/off experiment
[U: run-query.cc] re-run against our Python DataSource.

SkyhookDM's flagship measurement: the same scan-filter query with
storage-side execution ON (OSDs evaluate the predicate, only matching
rows cross the network) vs OFF (whole objects ship to the client,
which filters locally).  Here the "objects" are Parquet row groups,
the "OSD" is the Arrow-compute filter inside SkyhookReader.read(),
and the network boundary is the Arrow batch hand-off into the JVM.

The driver fixtures are written as ONE row group per file, which
collapses the object fan-out the experiment exists to show — so the
tool first relays the table into a many-row-group layout (50k rows per
group ≈ one SkyhookDM object), sorted by the predicate column so
min/max object stats actually prune (the reference keeps per-object
omap indexes for the same reason [U: cls_tabular.cc — build_index]).

    python tools/pushdown_ab.py [sf_dir]

Prints one JSON line: rows, wall times, row groups planned vs pruned.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from skyhookdb_ceph_spark.session import get_spark  # noqa: E402
from skyhookdb_ceph_spark.sources import skyhook_source as src  # noqa: E402

ROW_GROUP_ROWS = 50_000
PRED_COL = "l_orderkey"
# The fixture table is small enough that the ~0.15 s local job floor
# hides the shipped-bytes delta the experiment measures; replicate the
# table COPIES times (distinct key ranges, like more objects of the
# same table) so the data term dominates, as it does at deployment
# scale.  Override with SPARK_GRAFT_AB_COPIES=1 for the raw fixture.
COPIES = int(os.environ.get("SPARK_GRAFT_AB_COPIES", "8"))


def relayout(sf_dir: str, scratch: str) -> str:
    """lineitem -> sorted, 50k-rows-per-row-group copy (the many-object
    storage layout every claim below depends on)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import pyarrow as pa

    out = os.path.join(scratch, "lineitem_objects.parquet")
    t = pq.read_table(os.path.join(sf_dir, "lineitem.parquet"))
    t = t.take(pc.sort_indices(t, sort_keys=[(PRED_COL, "ascending")]))
    if COPIES > 1:
        span = pc.max(t[PRED_COL]).as_py() + 1
        shifted = []
        for i in range(COPIES):
            c = t.set_column(
                t.schema.get_field_index(PRED_COL),
                PRED_COL,
                pc.add(t[PRED_COL], i * span),
            )
            shifted.append(c)
        t = pa.concat_tables(shifted)
    pq.write_table(t, out, row_group_size=ROW_GROUP_ROWS)
    return out


def timed(fn):
    t0 = time.time()
    n = fn()
    return n, round(time.time() - t0, 4)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    scratch = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/skyhook_ab")
    os.makedirs(scratch, exist_ok=True)
    stats_file = os.path.join(scratch, "plan_stats.json")
    os.environ["SPARK_GRAFT_PLAN_STATS_FILE"] = stats_file
    spark = get_spark(app_name="pushdown_ab")
    path = relayout(sf_dir, scratch)
    hi = 15_000  # ~10% of the key space -> ~90% of objects prunable

    def agg(df):
        # a real aggregate over real columns: matching rows (all
        # columns — the reader has no projection pushdown, as SkyhookDM
        # ships whole matching records) must cross into the JVM
        row = df.filter(df[PRED_COL] < hi).groupBy().sum("l_quantity").collect()
        return float(row[0][0])

    def run_on():
        return agg(src.read_skyhook(spark, path))

    def run_off():
        return agg(src.read_skyhook_no_pushdown(spark, path))

    # warm both paths (plan + python worker spin-up), then time
    run_on(), run_off()
    n_on, t_on = timed(run_on)
    with open(stats_file) as fh:
        stats = json.load(fh)
    n_off, t_off = timed(run_off)
    if n_on != n_off:
        raise SystemExit(f"row mismatch: pushdown {n_on} vs client {n_off}")
    shutil.rmtree(scratch, ignore_errors=True)
    print(
        json.dumps(
            {
                "experiment": "use_cls_analog",
                "sum_matched": n_on,
                "row_groups_total": stats["total"],
                "row_groups_planned": stats["planned"],
                "row_groups_pruned": stats["pruned"],
                "pushdown_on_sec": t_on,
                "pushdown_off_sec": t_off,
                "speedup": round(t_off / t_on, 2) if t_on else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
