"""Shared-scan execution: N filter profiles must cost ONE table scan
(SURVEY §2.22 — the multi-screen curation pass).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from skyhookdb_ceph_spark.operators.shared_scan import shared_filter_profile
from skyhookdb_ceph_spark.plans.explain import explain_str
from skyhookdb_ceph_spark.queries._util import Catalog
from skyhookdb_ceph_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_shared_scan_reads_table_exactly_once(spark):
    """The whole point: five screens, one `Scan parquet` node.  Run
    naively this is five scans; the fold must leave exactly one."""
    import re

    plan = explain_str(load_all()["q_scan_shared"].fn(spark, SF))
    # formatted explain prints each node in the tree AND once in the
    # detail section — count detail headers, one per physical node
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    # and the scan must not drag the full row through the aggregate:
    # only the referenced columns appear in ReadSchema
    read = plan.split("ReadSchema")[1].split("\n")[0]
    assert "doc_id" not in read and "source" not in read


def test_shared_scan_matches_separate_passes(spark):
    """Fold-equivalence: each filter's (n, total) from the single-pass
    profile equals the same filter run as its own scan."""
    d = Catalog(spark, SF).documents
    filters = {
        "lang_en": F.col("lang") == "en",
        "long_doc": F.col("n_chars") >= 300,
        "none_match": F.col("n_chars") < 0,
    }
    prof = {
        r["filter"]: (r["n_rows"], r["total_value"])
        for r in shared_filter_profile(
            d, filters, F.col("n_chars")
        ).collect()
    }
    for name, pred in filters.items():
        row = d.filter(pred).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.coalesce(F.sum("n_chars"), F.lit(0))
            .cast("bigint")
            .alias("v"),
        ).first()
        assert prof[name] == (row["n"], row["v"]), name
