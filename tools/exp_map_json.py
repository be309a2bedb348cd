#!/usr/bin/env python
"""One-off experiment: q_fn_map_json parser variants, median-of-5 at
sf0.1 (VERDICT r8 item 4).

Variants (all behind the same ensure_parallelism repartition so the
parse spreads across cores — the measured r7 win):

  A  get_json_object (current shipped plan)
  B  parse_json(props) -> variant_get(..., '$.k', 'int')  (Spark 4 VARIANT)
  C  from_json struct (the r6-rejected hoist, re-measured for context)

Prints one JSON line: per-variant 5 samples + median.  Decision rule:
keep the current plan unless a variant's median beats it by more than
the observed sample spread (the ±15 % noise box this machine shows).
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from skyhookdb_ceph_spark.operators import ensure_parallelism  # noqa: E402
from skyhookdb_ceph_spark.queries._util import Catalog, ratio  # noqa: E402
from skyhookdb_ceph_spark.session import get_spark  # noqa: E402


def mat(df):
    return sum(b.num_rows for b in df._collect_as_arrow())  # noqa: SLF001


def variant_a(e):
    w = ensure_parallelism(e.select("event_type", "props"))
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        ratio(F.avg(F.get_json_object("props", "$.k").cast("int"))).alias("avg_k"),
    )


def variant_b(e):
    w = ensure_parallelism(e.select("event_type", "props"))
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        ratio(F.avg(k)).alias("avg_k"),
    )


def variant_c(e):
    w = ensure_parallelism(e.select("event_type", "props"))
    s = F.from_json("props", "struct<k:int>")
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        ratio(F.avg(s.getField("k"))).alias("avg_k"),
    )


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="exp_map_json", shuffle_partitions=8)
    spark.range(1).collect()
    e = Catalog(spark, sf).events
    e.count()  # warm page cache + scan metadata

    variants = [("get_json_object", variant_a),
                ("variant_get", variant_b),
                ("from_json_struct", variant_c)]
    samples = {name: [] for name, _ in variants}
    rows = {}
    for name, fn in variants:  # warm each plan/codegen path, unmeasured
        rows[name] = mat(fn(e))
    # Interleave rounds so JVM warm-up drift spreads evenly across
    # variants instead of penalizing whichever runs first.
    for _ in range(5):
        for name, fn in variants:
            t = time.perf_counter()
            mat(fn(e))
            samples[name].append(round((time.perf_counter() - t) * 1000, 1))
    out = {
        name: {
            "rows": rows[name],
            "samples_ms": samples[name],
            "median_ms": statistics.median(samples[name]),
        }
        for name, _ in variants
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
