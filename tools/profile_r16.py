#!/usr/bin/env python
"""Round-16 optimization harness: time + capture plans for a set of
queries under the bench profile (AQE off, shuffle=8, retry-less — the
same session bench.py uses so numbers are comparable).

    python tools/profile_r16.py q_graph_triangles q_maint_recluster ...
    python tools/profile_r16.py --plans-dir plans/r16 --suffix before q_x

Per query: warm run, N timed runs (default 3, median reported), and
.explain("formatted") written to <plans-dir>/<name>_<suffix>.txt when
--plans-dir is given.  Timing methodology matches bench.py
(_collect_as_arrow materialization).  Job groups are labelled so the
UI/event logs attribute stages to queries (guide §1.5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from skyhookdb_ceph_spark.registry import load_all  # noqa: E402
from skyhookdb_ceph_spark.session import get_spark  # noqa: E402


def _materialize(df) -> int:
    batches = df._collect_as_arrow()  # noqa: SLF001
    return sum(b.num_rows for b in batches)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_TASK_ATTEMPTS", "1")
    spark = get_spark(
        app_name="skyhook_profile_r16",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8")),
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.cbo.enabled": "false",
        },
    )
    spark.range(1).collect()
    specs = load_all()
    out: dict[str, dict] = {}
    for name in args.queries:
        spec = specs[name]
        live = "live-stream" in spec.tags or "iterative" in spec.tags
        spark.sparkContext.setJobDescription(f"profile:{name}")
        warm_df = spec.fn(spark, args.sf_dir)
        _materialize(warm_df)
        if args.plans_dir and not live:
            pdir = Path(_REPO) / args.plans_dir
            pdir.mkdir(parents=True, exist_ok=True)
            plan = warm_df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                warm_df._jdf.queryExecution(), "formatted"
            )
            (pdir / f"{name}_{args.suffix}.txt").write_text(plan)
        reps = 1 if live else args.reps
        samples = []
        for _ in range(reps):
            t = time.perf_counter()
            _materialize(spec.fn(spark, args.sf_dir))
            samples.append(time.perf_counter() - t)
            spark.catalog.clearCache()
        samples.sort()
        med = samples[len(samples) // 2]
        out[name] = {
            "median_sec": round(med, 4),
            "samples_sec": [round(s, 4) for s in samples],
        }
        print(f"{name}: {med:.3f}s  {out[name]['samples_sec']}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
