"""Profile streaming queries under different drain configs (dev tool)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from skyhookdb_ceph_spark.session import get_spark  # noqa: E402
from skyhookdb_ceph_spark.registry import load_all  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = [
    "q_stream_dedup",
    "q_stream_stateful",
    "q_stream_join",
    "q_stream_enrich",
    "q_stream_watermark",
]


def main():
    reg = load_all()
    spark = get_spark()
    # warm the JVM + python workers
    spark.range(10).toPandas()
    for rep in range(2):
        for name in QUERIES:
            t0 = time.time()
            df = reg[name].fn(spark, SF)
            n = df.count()
            dt = time.time() - t0
            print(f"rep{rep} {name:22s} {dt:7.3f}s  rows={n}", flush=True)


if __name__ == "__main__":
    main()
