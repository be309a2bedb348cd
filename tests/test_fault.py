"""Task-retry fault tolerance: the engine session allows >1 task
attempt (session.py local[N,M]) and q_fault_task_retry proves a failed
attempt's partial output is discarded, not double-counted."""

from __future__ import annotations

from skyhookdb_ceph_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_engine_session_allows_task_retries(spark):
    master = spark.sparkContext.master
    assert "," in master, f"engine session has no task retries: {master}"


def test_injected_task_failure_recovers_exactly(spark):
    """With retries available the query INJECTS a partition-0 attempt-0
    failure after partial work; the job must still succeed and the
    result must equal the clean batch answer — proving Spark discarded
    the failed attempt's output (a buggy retry that kept it would
    double-count and differ)."""
    from pyspark.sql import functions as F

    from skyhookdb_ceph_spark.catalog import Catalog

    got = {
        r["event_type"]: (r["n_events"], r["sum_cents"])
        for r in load_all()["q_fault_task_retry"].fn(spark, SF).collect()
    }
    expected = {
        r["event_type"]: (r["n_events"], r["sum_cents"])
        for r in (
            Catalog(spark, SF)
            .events.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(
                    F.floor(F.col("value") * 100).cast("bigint")
                ).alias("sum_cents"),
            )
            .collect()
        )
    }
    assert got == expected
