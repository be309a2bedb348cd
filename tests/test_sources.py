"""Format-plurality ingest tests (sources/formats.py)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from skyhookdb_ceph_spark.catalog import Catalog
from skyhookdb_ceph_spark.sources.formats import ingest, read_table


@pytest.fixture()
def scratch():
    d = tempfile.mkdtemp(prefix="skyhook_fmt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_ingest_roundtrip(spark, scratch, sf_small):
    src = Catalog(spark, sf_small).part.select("p_partkey", "p_name", "p_retailprice")
    src.write.mode("overwrite").option("header", True).csv(f"{scratch}/csv")
    out = ingest(
        spark,
        f"{scratch}/csv",
        "csv",
        f"{scratch}/pq",
        schema=src.schema,
    )
    assert out.count() == src.count()
    a = src.agg(F.sum("p_retailprice")).collect()[0][0]
    b = out.agg(F.sum("p_retailprice")).collect()[0][0]
    assert abs(a - b) < 1e-6


def test_json_read_with_explicit_schema(spark, scratch, sf_small):
    src = Catalog(spark, sf_small).events.select("event_id", "event_type")
    src.write.mode("overwrite").json(f"{scratch}/json")
    out = read_table(spark, f"{scratch}/json", "json", src.schema)
    assert out.schema == src.schema
    assert out.count() == src.count()


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, "/nonexistent", "hdf5")


def test_partitioned_ingest_prunes(spark, scratch, sf_small):
    src = Catalog(spark, sf_small).lineitem
    src.write.mode("overwrite").option("header", True).csv(f"{scratch}/csv")
    out = ingest(
        spark,
        f"{scratch}/csv",
        "csv",
        f"{scratch}/pq",
        schema=src.schema,
        partition_by=["l_returnflag"],
        sort_by=["l_orderkey"],
    )
    from skyhookdb_ceph_spark.plans.explain import explain_str

    plan = explain_str(out.filter(F.col("l_returnflag") == "R"))
    assert "PartitionFilters" in plan


def test_corrupt_file_fails_without_option_and_skips_with_it(
    spark, scratch, sf_small
):
    """q_scan_ignore_corrupt's negative half: the same garbage file
    that ignoreCorruptFiles=true skips must FAIL the scan under the
    default semantics — proving the option is load-bearing, not that
    the reader silently tolerated the file anyway."""
    import pytest
    from pyspark.sql import functions as F

    from skyhookdb_ceph_spark.catalog import Catalog

    d = Catalog(spark, sf_small).documents.select("doc_id", "n_chars")
    d.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{scratch}/ok")
    import os
    import shutil

    shutil.copytree(f"{scratch}/ok", f"{scratch}/dir", dirs_exist_ok=True)
    victim = next(
        f for f in os.listdir(f"{scratch}/dir")
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    with open(f"{scratch}/dir/{victim.replace('.parquet', 'b.parquet')}",
              "wb") as fh:
        fh.write(b"garbage, no parquet footer")
    with pytest.raises(Exception):
        spark.read.parquet(f"{scratch}/dir").count()
    good = (
        spark.read.option("ignoreCorruptFiles", "true")
        .parquet(f"{scratch}/dir")
        .count()
    )
    assert good == d.filter(F.col("doc_id") % 2 == 0).count()
