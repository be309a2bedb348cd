#!/usr/bin/env python
"""q_fn_map_json cost DECOMPOSITION (r10 verdict item 4): where do the
~300 ms at sf0.1 actually go — scan, shuffle, parse, or floor?

Variants, interleaved median-of-5 at sf0.1:

  floor      1-row job (dispatch floor)
  scan       serialized JVM scan of (event_type, props), octet-length
             aggregate — reads every props byte, parses nothing
  ser_parse  JVM scan -> VARIANT parse, NO repartition (parse
             serialized behind the single-row-group scan task)
  shipped    JVM scan -> ensure_parallelism repartition -> parse
             (the registered plan)
  presplit   Python source with min_splits=16 row-slices -> parse
             (parallel parse with NO shuffle: each slice re-decodes
             the 2 MB row group — redundant IO orders below the
             shuffle it replaces)

Decomposition: parse_cost = ser_parse - scan; shuffle_overhead =
shipped - (scan + parse/шcores...) — reported raw, the table speaks.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from skyhookdb_ceph_spark.operators import ensure_parallelism
from skyhookdb_ceph_spark.queries._util import Catalog, ratio
from skyhookdb_ceph_spark.session import get_spark


def mat(df):
    return sum(b.num_rows for b in df._collect_as_arrow())  # noqa: SLF001


def _parse_agg(w):
    k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "int")
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"), ratio(F.avg(k)).alias("avg_k")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(
        app_name="exp_map_json_decomp",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )

    def floor_v():
        return spark.range(1)

    def scan_v():
        e = Catalog(spark, sf_dir).events
        return e.select("event_type", "props").agg(
            F.sum(F.octet_length("props")).alias("b")
        )

    def ser_parse_v():
        e = Catalog(spark, sf_dir).events
        return _parse_agg(e.select("event_type", "props"))

    def shipped_v():
        e = Catalog(spark, sf_dir).events
        return _parse_agg(ensure_parallelism(e.select("event_type", "props")))

    def presplit_v():
        from skyhookdb_ceph_spark.sources.skyhook_source import register

        register(spark)
        e = (
            spark.read.format("skyhook")
            .option("path", f"{sf_dir}/events.parquet")
            .option("min_splits", "16")
            .load()
        )
        return _parse_agg(e.select("event_type", "props"))

    variants = {
        "floor": floor_v,
        "scan": scan_v,
        "ser_parse": ser_parse_v,
        "shipped": shipped_v,
        "presplit": presplit_v,
    }
    for fn in variants.values():
        mat(fn())  # warm
    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):  # interleaved — session drift hits all arms
        for name, fn in variants.items():
            t = time.perf_counter()
            mat(fn())
            samples[name].append(time.perf_counter() - t)
    out = {
        name: {
            "median_ms": round(statistics.median(v) * 1e3, 1),
            "samples_ms": [round(x * 1e3, 1) for x in v],
        }
        for name, v in samples.items()
    }
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "variants": out}))


if __name__ == "__main__":
    main()
