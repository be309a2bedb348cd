#!/usr/bin/env python
"""Round-16 structural plan census over the FULL registry.

For every registered query, builds the DataFrame (eager lifecycle ops
run their builds once) and records counts of the plan features the
optimization round cares about:

- Exchange / BroadcastExchange / ReusedExchange
- BatchEvalPython / ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
- Scan ExistingRDD  (Python-RDD-backed results — should be ZERO after
  the r16 local_df conversion except where an operator legitimately
  needs an RDD bridge)
- CartesianProduct / BroadcastNestedLoopJoin

Writes one JSON map to stdout; live-stream queries are skipped (their
returned frame is a drained memory sink, not the pipeline's plan).

    python tools/plan_census_r16.py > plans/r16/plan_census.json
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from skyhookdb_ceph_spark.registry import load_all  # noqa: E402
from skyhookdb_ceph_spark.session import get_spark  # noqa: E402

FEATURES = {
    "exchange": re.compile(r"\bExchange\b"),
    "broadcast_exchange": re.compile(r"\bBroadcastExchange\b"),
    "reused_exchange": re.compile(r"\bReusedExchange\b"),
    "python_eval": re.compile(r"BatchEvalPython|ArrowEvalPython"),
    "map_in_pandas": re.compile(r"MapInPandas|FlatMapGroupsInPandas"),
    "existing_rdd": re.compile(r"Scan ExistingRDD"),
    "cartesian": re.compile(r"CartesianProduct"),
    "bnl_join": re.compile(r"BroadcastNestedLoopJoin"),
}


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_TASK_ATTEMPTS", "1")
    spark = get_spark(
        app_name="plan_census_r16",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8")
        ),
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.cbo.enabled": "false",
        },
    )
    spark.range(1).collect()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    out: dict[str, dict] = {}
    for name, spec in sorted(specs.items()):
        if "live-stream" in spec.tags or "iterative" in spec.tags:
            out[name] = {"skipped": "live-stream/iterative"}
            continue
        try:
            spark.sparkContext.setJobDescription(f"census:{name}")
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "simple"
            )
            row = {
                k: len(rx.findall(plan)) for k, rx in FEATURES.items()
            }
            # plain Exchange count excludes broadcast/reused
            row["exchange"] -= row["broadcast_exchange"] + row["reused_exchange"]
            out[name] = row
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:160]}
        finally:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
