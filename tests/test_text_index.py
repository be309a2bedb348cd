"""Persisted inverted TEXT index (SURVEY.md §2.11): keyword search
(the original IDX_TXT analog — the on-disk index must prune to one
token-prefix partition and match the in-memory ranking), plus the
round-15 lifecycle suite: the BM25 probe must READ the layout — tok0
partition prune + token filter — never re-tokenize the corpus, and
the incremental append must be append-only under the
frozen-tokenization rule.  Mirrors tests/test_sig_index.py for the
text side of the index lifecycle."""

from __future__ import annotations

import os
import re
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from skyhookdb_ceph_spark.catalog import Catalog
from skyhookdb_ceph_spark.operators.text_index import (
    build_inverted_index,
    keyword_search,
    search_persisted_index,
    write_index,
)
from skyhookdb_ceph_spark.plans.explain import explain_str
from skyhookdb_ceph_spark.queries.pipeline17 import (
    _postings,
    _with_tok0,
    build_text_index,
    probe_bm25,
)
from skyhookdb_ceph_spark.registry import load_all

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# keyword search over the persisted index (pre-r15 suite, kept intact)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def persisted_index(spark):
    tmp = tempfile.mkdtemp(prefix="skyhook_idx_")
    docs = Catalog(spark, SF).documents
    write_index(build_inverted_index(docs), f"{tmp}/idx")
    yield spark, SF, f"{tmp}/idx"
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
    mem = [
        tuple(r)
        for r in keyword_search(build_inverted_index(docs), "join").collect()
    ]
    disk = [
        tuple(r)
        for r in search_persisted_index(spark, path, "join").collect()
    ]
    assert disk == mem
    assert len(disk) > 0


# ---------------------------------------------------------------------------
# round-15 lifecycle suite: BM25 probe-only + incremental append
# ---------------------------------------------------------------------------

# Tokenize-only physical markers: the build pass is an explode over a
# split of the document text.  None may appear in a probe-only plan —
# and neither may the documents table itself.
_TOKENIZE_MARKERS = ("explode", "split", "documents")


def _snapshot_parquet(root: str) -> dict[str, tuple[int, int]]:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def test_probe_plan_never_tokenizes(spark, tmp_path):
    """The probe plan contains no explode, no split, and no scan of
    the documents table — at 100 TB that absence IS the index: a few
    posting lists + the doc-length sidecar instead of re-tokenizing
    every document body per query."""
    tmp = str(tmp_path / "txtidx")
    build_text_index(spark, SF, tmp)
    plan = explain_str(probe_bm25(spark, tmp))
    for marker in _TOKENIZE_MARKERS:
        assert marker not in plan, f"probe plan re-tokenizes: {marker}"


def test_probe_plan_prunes_tok0_partitions(spark, tmp_path):
    """The posting fetch is a PARTITION PRUNE: the scan's
    PartitionFilters carry the tok0 predicate (the omap point-lookup
    analog — only the query terms' first-letter directories are
    read), and the token equality is pushed into the pruned scan."""
    tmp = str(tmp_path / "txtidx")
    build_text_index(spark, SF, tmp)
    plan = explain_str(probe_bm25(spark, tmp))
    assert re.search(r"PartitionFilters: \[[^\]]*tok0", plan)
    assert re.search(r"PushedFilters: \[[^\]]*token", plan)


def test_probe_matches_inline_bm25(spark, tmp_path):
    """Persisting the index must not change a single answer row vs
    the per-execution q_text_bm25 (the indexed query also shares the
    inline oracle, so the driver pins this at sf0.01; this is the
    sf0.001 fast path)."""
    tmp = str(tmp_path / "txtidx")
    build_text_index(spark, SF, tmp)
    indexed = sorted(map(tuple, probe_bm25(spark, tmp).collect()))
    reg = load_all()
    ref = sorted(map(tuple, reg["q_text_bm25"].fn(spark, SF).collect()))
    assert indexed == ref and len(indexed) == 10


def test_incremental_append_leaves_base_files_untouched(spark):
    """Appending delta postings writes NEW files only — every base
    data file (across all tok0 partition directories) survives with
    identical name, size, and mtime.  O(delta) maintenance; a rebuild
    is O(corpus)."""
    d = Catalog(spark, SF).documents
    base = d.filter("doc_id % 10 <> 7")
    delta = d.filter("doc_id % 10 = 7")
    tmp = tempfile.mkdtemp(prefix="skyhook_txtinc_test_")
    try:
        _with_tok0(_postings(base)).withColumn(
            "is_delta", F.lit(0).cast("int")
        ).write.mode("overwrite").partitionBy("tok0").parquet(
            f"{tmp}/postings"
        )
        before = _snapshot_parquet(f"{tmp}/postings")
        _with_tok0(_postings(delta)).withColumn(
            "is_delta", F.lit(1).cast("int")
        ).write.mode("append").partitionBy("tok0").parquet(
            f"{tmp}/postings"
        )
        after = _snapshot_parquet(f"{tmp}/postings")
        assert set(before) <= set(after)  # strictly additive
        assert len(after) > len(before)  # delta landed as new files
        for f, meta in before.items():
            assert after[f] == meta, f"base file rewritten: {f}"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_frozen_tokenization_is_a_real_parameter(spark):
    """The frozen-tokenization rule has teeth on the fixture: the
    delta cohort tokenized with the frozen rule (space split) differs
    from a case-folding variant in at least the tok0 routing of some
    posting — i.e. the census q_text_index_incremental pins would
    actually catch a delta job that drifted.  The documents fixture
    is lowercase, so drift is modeled on the delimiter (split on 'e'
    stands in for any rule change); if the fixture ever makes both
    rules agree, this fails loudly rather than letting the pin rot."""
    d = Catalog(spark, SF).documents.filter("doc_id % 10 = 7")
    frozen = sorted(map(tuple, _postings(d).collect()))
    drifted = sorted(
        map(
            tuple,
            d.select(
                "doc_id", F.explode(F.split("text", "e")).alias("token")
            )
            .filter(F.col("token") != "")
            .groupBy("token", "doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
            .collect(),
        )
    )
    assert frozen != drifted


def test_stats_sidecar_roundtrips(spark, tmp_path):
    """The persisted (n_docs, avgdl) equals a fresh derivation from
    the corpus — the BM25 parameters the probe reads back instead of
    re-deriving from document bodies."""
    tmp = str(tmp_path / "txtidx")
    build_text_index(spark, SF, tmp)
    stored = spark.read.parquet(f"{tmp}/stats").collect()
    d = Catalog(spark, SF).documents
    fresh = (
        d.select(F.size(F.split("text", " ")).cast("bigint").alias("dl"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
        .collect()
    )
    assert [tuple(r) for r in stored] == [tuple(r) for r in fresh]


# ---------------------------------------------------------------------------
# round-15 wave 2: hybrid RRF over BOTH persisted indexes
# ---------------------------------------------------------------------------

_ENCODE_MARKERS = ("shiftleft", "posexplode", "percentile")


def test_hybrid_probe_plan_never_tokenizes_or_encodes(spark, tmp_path):
    """The fused probe's plan contains neither the text build pass
    (explode/split of document bodies, documents scan) nor the
    signature encode pass (shiftleft packing, posexplode, percentile
    probe) — both ran once at build.  At 100 TB a hybrid query
    touches a few posting lists, the 16 B/vector signature column,
    and ~_NCAND float rows."""
    from skyhookdb_ceph_spark.queries.pipeline16 import build_sig_index
    from skyhookdb_ceph_spark.queries.pipeline17 import probe_hybrid_rrf

    tdir = str(tmp_path / "txt")
    sdir = str(tmp_path / "sig")
    build_text_index(spark, SF, tdir)
    build_sig_index(spark, SF, sdir)
    e = Catalog(spark, SF).embeddings
    plan = explain_str(probe_hybrid_rrf(spark, tdir, sdir, e))
    for marker in _TOKENIZE_MARKERS + _ENCODE_MARKERS:
        assert marker not in plan, f"hybrid probe rebuilds: {marker}"
    # both index layouts actually feed the plan
    assert os.path.basename(tdir) in plan
    assert os.path.basename(sdir) in plan


def test_hybrid_probe_candidate_pred_leaves_df_corpuswide(spark, tmp_path):
    """probe_bm25's doc_pred excludes candidates WITHOUT changing
    term weights: df is counted over the unfiltered pruned postings
    (a property of the index), so scores for surviving docs are
    byte-identical with and without the exclusion."""
    tmp = str(tmp_path / "txtidx")
    build_text_index(spark, SF, tmp)
    base = {
        r["doc_id"]: r["bm25"]
        for r in probe_bm25(spark, tmp, k=50).collect()
    }
    excl = {
        r["doc_id"]: r["bm25"]
        for r in probe_bm25(
            spark, tmp, k=50, doc_pred="doc_id <> 0"
        ).collect()
    }
    assert 0 not in excl
    for d, s in excl.items():
        assert base[d] == s, f"df shifted under candidate exclusion: {d}"


def test_compacted_layout_answers_identically(spark, tmp_path):
    """Compaction must not change one answer: probe_bm25 over the
    fragmented (base + appended delta) layout equals probe_bm25 over
    the compacted rewrite, row for row — and the compacted layout
    really is one file per tok0 directory."""
    from skyhookdb_ceph_spark.queries.pipeline17 import (
        _max_files_per_tok0,
        _TXT_DELTA_PRED,
    )

    d = Catalog(spark, SF).documents
    root = str(tmp_path / "cmp")
    frag = f"{root}/postings"
    _with_tok0(
        _postings(d.filter(f"NOT ({_TXT_DELTA_PRED})"))
    ).write.mode("overwrite").partitionBy("tok0").parquet(frag)
    _with_tok0(
        _postings(d.filter(_TXT_DELTA_PRED))
    ).write.mode("append").partitionBy("tok0").parquet(frag)
    comp = f"{root}/postings_compacted"
    (
        spark.read.parquet(frag)
        .repartition("tok0")
        .sortWithinPartitions("token", "doc_id")
        .write.partitionBy("tok0")
        .parquet(comp)
    )
    assert _max_files_per_tok0(comp) == 1
    assert _max_files_per_tok0(frag) > 1
    # identical probes: point both layouts at the same sidecars
    build_text_index(spark, SF, f"{root}/full")
    for tag, src in (("frag", frag), ("comp", comp)):
        idxdir = f"{root}/idx_{tag}"
        os.makedirs(idxdir)
        os.symlink(src, f"{idxdir}/postings")
        os.symlink(f"{root}/full/dlens", f"{idxdir}/dlens")
        os.symlink(f"{root}/full/stats", f"{idxdir}/stats")
    a = sorted(map(tuple, probe_bm25(spark, f"{root}/idx_frag").collect()))
    b = sorted(map(tuple, probe_bm25(spark, f"{root}/idx_comp").collect()))
    assert a == b and len(a) == 10
