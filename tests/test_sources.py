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
