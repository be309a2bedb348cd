"""Persisted ANN signature index (SURVEY.md §2.26): the probe must
READ the layout, never re-encode, and the incremental append must be
append-only under the frozen-parameter rule — the scale properties
q_sim_knn_binary_indexed / q_sim_knn_2bit_indexed / q_vec_sig_incremental
claim, proven in plans and on-disk file sets."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from skyhookdb_ceph_spark.catalog import Catalog
from skyhookdb_ceph_spark.plans.explain import explain_str
from skyhookdb_ceph_spark.queries.pipeline16 import (
    _encode,
    _exploded,
    _thresholds,
    build_sig_index,
    probe_2bit,
    probe_binary,
)
from skyhookdb_ceph_spark.registry import load_all

SF = "/root/testdata/sf0.001"

# Encode-only physical markers: signature packing is shiftleft folds,
# the thermometer thresholds are a percentile aggregation over a
# posexplode pass.  None may appear in a probe-only plan.
_ENCODE_MARKERS = ("shiftleft", "posexplode", "percentile")


@pytest.fixture(scope="module")
def sig_index(spark):
    tmp = tempfile.mkdtemp(prefix="skyhook_sigtest_")
    build_sig_index(spark, SF, tmp)
    yield spark, tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _probe_plan(spark, tmp, probe):
    e = Catalog(spark, SF).embeddings
    return explain_str(probe(e, spark.read.parquet(f"{tmp}/sigs")))


@pytest.mark.parametrize("probe", [probe_binary, probe_2bit])
def test_probe_plan_never_encodes(sig_index, probe):
    """The coarse stage of an indexed probe reads persisted signature
    columns; the encode machinery (shiftleft packing, posexplode,
    percentile threshold probe) must be absent from the entire probe
    plan — at 100 TB that absence IS the index: 16-48 B/vector of
    column-pruned IO instead of a corpus-wide encode per query batch."""
    spark, tmp = sig_index
    plan = _probe_plan(spark, tmp, probe)
    for marker in _ENCODE_MARKERS:
        assert marker not in plan, f"probe plan re-encodes: {marker}"


def test_probe_plan_scans_index(sig_index):
    """The probe's coarse scan reads the persisted index files (the
    sigs/ path appears as a scan location) and the float corpus enters
    only via the rerank join-back (embeddings scanned too — exactly
    two parquet sources)."""
    spark, tmp = sig_index
    plan = _probe_plan(spark, tmp, probe_binary)
    assert os.path.basename(tmp) in plan  # index layout is scanned
    assert "embeddings" in plan  # rerank join-back to floats


@pytest.mark.parametrize(
    ("probe", "inline"),
    [(probe_binary, "q_sim_knn_binary"), (probe_2bit, "q_sim_knn_2bit")],
)
def test_probe_matches_inline_tier(sig_index, probe, inline):
    """Persisting the index must not change a single answer row vs the
    per-execution-encode tier (the indexed queries also share the
    inline tiers' oracles, so the driver pins this at sf0.01; this is
    the sf0.001 fast path)."""
    spark, tmp = sig_index
    e = Catalog(spark, SF).embeddings
    indexed = sorted(
        map(tuple, probe(e, spark.read.parquet(f"{tmp}/sigs")).collect())
    )
    ref = sorted(map(tuple, load_all()[inline].fn(spark, SF).collect()))
    assert indexed == ref and len(indexed) > 0


def test_incremental_append_leaves_base_files_untouched(spark):
    """Appending delta signatures writes NEW files only: every base
    data file survives with identical name, size, and mtime —
    O(delta) maintenance, the property that makes per-ingest-batch
    refresh affordable (rebuild is O(corpus))."""
    e = Catalog(spark, SF).embeddings
    base = e.filter("vec_id % 10 <> 7")
    delta = e.filter("vec_id % 10 = 7")
    thr = _thresholds(_exploded(base))
    tmp = tempfile.mkdtemp(prefix="skyhook_siginc_test_")
    try:
        _encode(_exploded(base), thr).withColumn(
            "is_delta", F.lit(0)
        ).write.mode("overwrite").parquet(f"{tmp}/sigs")

        def snapshot():
            return {
                f: (st.st_size, st.st_mtime_ns)
                for f in os.listdir(f"{tmp}/sigs")
                if f.endswith(".parquet")
                for st in [os.stat(f"{tmp}/sigs/{f}")]
            }

        before = snapshot()
        _encode(_exploded(delta), thr).withColumn(
            "is_delta", F.lit(1)
        ).write.mode("append").parquet(f"{tmp}/sigs")
        after = snapshot()
        assert set(before) <= set(after)  # strictly additive
        assert len(after) > len(before)  # delta landed as new files
        for f, meta in before.items():
            assert after[f] == meta, f"base file rewritten: {f}"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_frozen_thresholds_are_a_real_parameter(spark):
    """The frozen-parameter rule has teeth on the fixture: encoding
    the delta cohort with BASE-derived quartiles differs from
    encoding it with full-corpus quartiles in at least one plane bit
    — so q_vec_sig_incremental's oracle (thr from base only) would
    actually catch an implementation that re-derived.  If the fixture
    ever degenerates to identical quartiles this test fails loudly
    rather than letting the pin rot silently."""
    e = Catalog(spark, SF).embeddings
    base = e.filter("vec_id % 10 <> 7")
    delta = e.filter("vec_id % 10 = 7")
    frozen = _encode(_exploded(delta), _thresholds(_exploded(base)))
    rederived = _encode(_exploded(delta), _thresholds(_exploded(e)))
    a = sorted(map(tuple, frozen.collect()))
    b = sorted(map(tuple, rederived.collect()))
    assert a != b


def test_params_sidecar_roundtrips(sig_index):
    """The persisted threshold table equals a fresh derivation from
    the same corpus (cell-exact — both sides quantize to the 1e-6
    grid before comparison by construction)."""
    spark, tmp = sig_index
    stored = sorted(
        map(tuple, spark.read.parquet(f"{tmp}/params").collect())
    )
    fresh = sorted(
        map(
            tuple,
            _thresholds(_exploded(Catalog(spark, SF).embeddings)).collect(),
        )
    )
    assert stored == fresh and len(stored) == 64
