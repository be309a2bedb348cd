"""Inverted-index persistence: the on-disk index must prune to one
token-prefix partition and return the same ranking as the in-memory
index (§2.11 IDX_TXT analog, end to end)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from skyhookdb_ceph_spark.catalog import Catalog
from skyhookdb_ceph_spark.operators.text_index import (
    build_inverted_index,
    keyword_search,
    search_persisted_index,
    write_index,
)
from skyhookdb_ceph_spark.plans.explain import explain_str


@pytest.fixture(scope="module")
def persisted_index(spark):
    sf = "/root/testdata/sf0.001"
    tmp = tempfile.mkdtemp(prefix="skyhook_idx_")
    docs = Catalog(spark, sf).documents
    write_index(build_inverted_index(docs), f"{tmp}/idx")
    yield spark, sf, f"{tmp}/idx"
    shutil.rmtree(tmp, ignore_errors=True)


def test_persisted_search_prunes_partitions(persisted_index):
    spark, _, path = persisted_index
    plan = explain_str(search_persisted_index(spark, path, "join"))
    assert "PartitionFilters" in plan
    frag = plan.split("PartitionFilters", 1)[1].splitlines()[0]
    assert "tok0" in frag  # the prune actually keys on the prefix dir


def test_persisted_search_matches_in_memory(persisted_index):
    spark, sf, path = persisted_index
    docs = Catalog(spark, sf).documents
    mem = [tuple(r) for r in keyword_search(build_inverted_index(docs), "join").collect()]
    disk = [tuple(r) for r in search_persisted_index(spark, path, "join").collect()]
    assert disk == mem
    assert len(disk) > 0
