#!/usr/bin/env python
"""One-off experiment: probe-driven shuffle width vs the static conf
(r9 verdict item 8's measured before/after).

Both variants are the SAME shuffle-hash join + aggregate; the only
difference is who sizes the keyed exchange:

  default — the session-static spark.sql.shuffle.partitions
            (EnsureRequirements inserts the exchanges at conf width);
  probed  — explicit repartition(measured width, key) on both sides
            (the q_join_width_probed branch; width 37 at sf0.1 with
            the shipped 16384-row target).

Measured at conf=32 (the bench profile — probe ≈ conf, expected
equal) and conf=4 (an undersized static conf, the 100 TB
misconfiguration analog where one session-wide number is far too
small for the big fact-fact shuffle — the failure the probe exists to
prevent; AQE cannot split an undersized shuffle upward).  Reps are
interleaved round-robin so warm-up drift cannot favor one variant;
fresh DataFrame per rep (no shuffle reuse).  Prints one JSON line.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from skyhookdb_ceph_spark.operators.stats import (  # noqa: E402
    measured_shuffle_width,
)
from skyhookdb_ceph_spark.queries._util import Catalog, money  # noqa: E402
from skyhookdb_ceph_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
REPS = 5


def mat(df):
    return sum(b.num_rows for b in df._collect_as_arrow())  # noqa: SLF001


def main() -> int:
    spark = get_spark(shuffle_partitions=32)
    c = Catalog(spark, SF)

    def agg(joined):
        return (
            joined.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                money(F.sum("l_quantity")).alias("sum_qty"),
            )
            .coalesce(1)
            .sortWithinPartitions("o_orderpriority")
        )

    def build_default():
        li = c.lineitem.select("l_orderkey", "l_quantity")
        o = c.orders.select("o_orderkey", "o_orderpriority")
        return agg(
            li.join(
                o.hint("shuffle_hash"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )

    li0 = c.lineitem.select("l_orderkey", "l_quantity")
    width = measured_shuffle_width(li0, 16384)

    def build_probed():
        li = c.lineitem.select("l_orderkey", "l_quantity")
        o = c.orders.select("o_orderkey", "o_orderpriority")
        return agg(
            li.repartition(width, "l_orderkey").join(
                o.repartition(width, "o_orderkey").hint("shuffle_hash"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )

    variants = {"default": build_default, "probed": build_probed}
    out: dict[str, dict] = {"width": width}
    for conf in (32, 4):
        spark.conf.set("spark.sql.shuffle.partitions", str(conf))
        samples = {name: [] for name in variants}
        for name, build in variants.items():
            mat(build())  # warm each variant once
        for _ in range(REPS):
            for name, build in variants.items():  # round-robin
                t0 = time.perf_counter()
                mat(build())
                samples[name].append(
                    round((time.perf_counter() - t0) * 1e3, 1)
                )
        for name in variants:
            out[f"conf{conf}_{name}"] = {
                "samples_ms": samples[name],
                "median_ms": statistics.median(samples[name]),
            }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
