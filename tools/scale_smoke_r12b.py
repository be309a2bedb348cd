#!/usr/bin/env python
"""Round-12 SECOND-wave scaling smoke: decade evidence for the §2.24
operators (queries/pipeline14.py) over the gen_scale.py fixtures
(§I protocol: one session, warm run absorbed per (query, sf), one
timed run, clearCache between measurements, local[32]).

Scaling notes the table must be read with (fixture-design artifacts,
not plan defects — called out per row in BASELINE §L.8):

- q_join_interval_grid: gen_scale keeps the event TIME SPAN constant
  and multiplies density k-fold, so overlapping-pair OUTPUT grows
  ~k^2 — the information floor for an overlap join is its output
  size.  A production 100 TB corpus grows the span (linear pairs),
  not the per-hour rate.  The claim under test is therefore
  "runtime tracks OUTPUT rows", not "runtime tracks input rows".
- q_sim_knn_binary / q_sim_maxsim: the query set is vec_id % 100, so
  |Q| grows with the corpus and the coarse stage is |Q| x |corpus|
  ~ k^2 by construction.  Production pins |Q| (a user batch); the
  per-query cost — the design claim — is the k^2 figure divided by
  |Q|, reported alongside.

    python tools/scale_smoke_r12b.py [sf_dir ...]
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
    "q_join_interval_grid",  # grid overlap join — output-bound
    "q_agg_mutual_info",     # corpus explode -> vocab-sized MI
    "q_stats_ks_drift",      # distributed ECDF prefix sums
    "q_vec_ood_filter",      # exploded centroid/cos aggregations
    "q_sim_knn_binary",      # Hamming coarse + rerank (|Q| ~ n/100)
    "q_sim_maxsim",          # late-interaction rerank (|Q| ~ n/100)
    "q_sim_maxsim_pruned",   # the composed cascade (constant rerank)
    "q_dedup_phash",         # v2 distinct-signature clusters (flat)
    "q_stream_drift",        # batch form of the shared stream core
]

DIRS = [
    "/root/testdata/sf0.1",
    "/root/repo/.scratch/scale/sf1",
    "/root/repo/.scratch/scale/sf10",
]


def mat(df):
    return sum(b.num_rows for b in df._collect_as_arrow())  # noqa: SLF001


def ks_drift_events(spark, sf_dir):
    """Smoke-only twin of q_stats_ks_drift on a table gen_scale
    actually GROWS: gen_scale copies `orders` verbatim across decades
    (it is a small dim there), so the registered query's smoke curve
    would measure a fixed input.  Same plan shape, same bucketed
    prefix-sum decomposition, over events.value split at mid-month —
    events rows grow 100x across the fixture decades."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from skyhookdb_ceph_spark.queries._util import Catalog

    ev = Catalog(spark, sf_dir).events
    d = ev.selectExpr(
        "value AS v",
        "CAST(ts < TIMESTAMP '2024-01-16' AS INT) AS ia",
    )
    tot = d.agg(
        F.sum("ia").cast("bigint").alias("n_a"),
        F.sum(F.expr("1 - ia")).cast("bigint").alias("n_b"),
    )
    g = (
        d.groupBy("v")
        .agg(F.sum("ia").alias("ca"), F.sum(F.expr("1 - ia")).alias("cb"))
        .withColumn("bkt", F.expr("CAST(floor(v / 25.0) AS BIGINT)"))
    )
    wi = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = g.select(
        "bkt",
        F.sum("ca").over(wi).alias("ia_cum"),
        F.sum("cb").over(wi).alias("ib_cum"),
    )
    bs = g.groupBy("bkt").agg(F.sum("ca").alias("sa"), F.sum("cb").alias("sb"))
    wo = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = bs.select(
        "bkt",
        F.coalesce(F.sum("sa").over(wo), F.lit(0)).alias("oa"),
        F.coalesce(F.sum("sb").over(wo), F.lit(0)).alias("ob"),
    )
    cum = intra.join(F.broadcast(boff), "bkt").selectExpr(
        "oa + ia_cum AS cum_a", "ob + ib_cum AS cum_b"
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .selectExpr(
            "n_a",
            "n_b",
            "abs(CAST(cum_a AS DOUBLE) / n_a"
            " - CAST(cum_b AS DOUBLE) / n_b) AS dd",
        )
        .groupBy("n_a", "n_b")
        .agg(F.expr("floor(max(dd) * 1000000 + 0.5) / 1000000").alias("ks"))
    )


def main() -> None:
    dirs = sys.argv[1:] or DIRS
    spark = get_spark(app_name="scale_smoke_r12b", shuffle_partitions=32)
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
