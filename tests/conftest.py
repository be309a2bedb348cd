"""Shared fixtures: one SparkSession for the whole test run."""

from __future__ import annotations

import pytest

from skyhookdb_ceph_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Retry-LESS session (local[N,1]): the engine default is local[N,2]
    # (session.py — production resilience), but under test a silent
    # second attempt would mask first-attempt flakiness in ordinary
    # queries (r6 verdict item 7).  Retry semantics are exercised
    # explicitly by tests/test_fault.py in a retry-capable subprocess.
    import os

    os.environ.setdefault("SPARK_GRAFT_TASK_ATTEMPTS", "1")
    s = get_spark(app_name="skyhook_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL
