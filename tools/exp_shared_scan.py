#!/usr/bin/env python
"""Measure the shared-scan fold: 5 curation screens as ONE
multi-aggregate pass vs 5 separate scan+aggregate jobs (sf0.1).

Records the N-pass vs 1-pass numbers behind BASELINE.md §L.2.
Usage: python tools/exp_shared_scan.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path
from statistics import median

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from skyhookdb_ceph_spark.operators.shared_scan import shared_filter_profile
from skyhookdb_ceph_spark.queries._util import Catalog
from skyhookdb_ceph_spark.session import get_spark


def build_filters():
    return {
        "all_docs": F.lit(True),
        "lang_en": F.col("lang") == "en",
        "long_doc": F.col("n_chars") >= 300,
        "short_doc": F.col("n_chars") < 100,
        "has_digit": F.col("text").rlike("[0-9]"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="exp_shared_scan")

    def one_pass():
        d = Catalog(spark, sf_dir).documents
        return shared_filter_profile(
            d, build_filters(), F.col("n_chars")
        ).collect()

    def n_pass():
        d = Catalog(spark, sf_dir).documents
        out = []
        for name, pred in build_filters().items():
            out.append(
                (
                    name,
                    d.filter(pred)
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.coalesce(F.sum("n_chars"), F.lit(0)).alias("v"),
                    )
                    .first(),
                )
            )
        return out

    # warm (JVM, file listing)
    one_pass(), n_pass()
    t1, tn = [], []
    for _ in range(reps):
        # rebuild per rep: never time a prebuilt DataFrame (shuffle
        # reuse trap, BASELINE.md §G.2)
        t0 = time.perf_counter()
        one_pass()
        t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        n_pass()
        tn.append(time.perf_counter() - t0)
    print(
        f"sf_dir={sf_dir} reps={reps} "
        f"one_pass_med={median(t1):.3f}s samples={[round(x, 3) for x in t1]} "
        f"five_pass_med={median(tn):.3f}s samples={[round(x, 3) for x in tn]} "
        f"speedup={median(tn) / median(t1):.2f}x"
    )


if __name__ == "__main__":
    main()
