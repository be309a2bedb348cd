"""Round-11 wave (SURVEY.md §2.22).

Closing the r10 verdict's action items:

1. q_maint_recluster — the zone-map advisor's verdict turned into an
   ACTION: physically re-cluster the table on the advised key
   (operators/layout.write_partitioned: repartition + sortWithin-
   Partitions + partitionBy) and re-measure the skip fraction on the
   PHYSICAL files (a runstats pass grouped by _metadata.file_path,
   not by a logical zone expression) — the reference's
   runstats -> sort-on-write loop end-to-end
   [U: cls_tabular.cc — exec_runstats_op feeding sort-on-write].

2. q_stream_event_eviction — the CEP funnel hardened against state
   growth: per-user history truncates when a funnel COMPLETES
   (state shrinks on emission), bounding state under adversarial
   replay where q_stream_event_pattern's history grows forever.

3. q_scan_shared — multi-query shared-scan execution: N curation
   filters computed in ONE corpus pass as a single multi-aggregate
   plan (the reference's client fans one query over objects; a
   training-data pipeline runs MANY quality screens over the SAME
   pass — q_stats_profile generalized to arbitrary predicate sets).

Late wave (after the sf10 banded-MinHash hardening):

4. q_dedup_substring — exact-substring span dedup (Lee et al. 2022's
   "remove any 50-token substring appearing twice" preprocessing,
   suffix-array semantics re-expressed relationally).

5. q_dedup_minhash_recall — MEASURED recall curve of the (8,4)
   banded LSH vs a permissive independent-family reference detector;
   the audit owed after the r=1 -> r=4 change shipped on analytic
   math alone.

6. q_transform_strip_dup_spans — the ACTION twin of 4: remove every
   duplicated span and return the cleaned corpus (the recluster
   audit->action pattern applied to dedup).

House rules unchanged: identical aliases both sides, deterministic
everything, no all-pairs, no corpus-sized collect() — driver-side
materializations are verdict-table-sized (2-N rows) except the two
deliberate corpus-shaped TRANSFORM outputs (strip_dup_spans), which
a deployment writes back to storage instead of collecting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from skyhookdb_ceph_spark.queries._util import Catalog, local_df, quantize
from skyhookdb_ceph_spark.registry import query

# ---------------------------------------------------------------------------
# §2.22.1 advisor-driven re-clustering (runstats -> sort-on-write loop)
# ---------------------------------------------------------------------------

_RC_LO, _RC_HI = "1996-01-01", "1996-03-31"
_RC_KEY_WIDTH = 2048  # orderkey rows per physical-proxy zone file


def _rc_oracle() -> str:
    pred = (
        f"l_shipdate >= TIMESTAMP '{_RC_LO}' "
        f"AND l_shipdate <= TIMESTAMP '{_RC_HI} 23:59:59'"
    )
    legs = []
    # one file per zone value by construction (hash-repartition on the
    # partition column before partitionBy), so the file-level manifest
    # the Spark side measures equals this zone-level recompute
    for label, zone in (
        (
            "after_clustered_ship_month",
            "strftime(l_shipdate, '%Y-%m')",
        ),
        (
            "before_physical_orderkey",
            f"CAST(floor(l_orderkey / {_RC_KEY_WIDTH}) AS BIGINT)",
        ),
    ):
        legs.append(f"""
SELECT '{label}' AS layout,
  CAST(count(*) AS BIGINT) AS files_total,
  CAST(sum(sel) AS BIGINT) AS files_selected,
  CAST(sum(n) AS BIGINT) AS rows_total,
  CAST(sum(sel * n) AS BIGINT) AS rows_scanned,
  CAST(sum(m) AS BIGINT) AS rows_matched,
  CAST(CASE WHEN sum(sel * m) = sum(m) THEN 1 ELSE 0 END AS INT)
    AS lossless,
  floor((1.0 - sum(sel * n) * 1.0 / sum(n)) * 1000000 + 0.5) / 1000000
    AS skip_frac
FROM (
  SELECT {zone} AS zone, count(*) AS n,
    sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS m,
    CASE WHEN max(l_shipdate) >= TIMESTAMP '{_RC_LO}'
          AND min(l_shipdate) <= TIMESTAMP '{_RC_HI} 23:59:59'
         THEN 1 ELSE 0 END AS sel
  FROM lineitem GROUP BY 1) z""")
    return " UNION ALL ".join(legs) + " ORDER BY layout"


def _file_manifest_leg(spark, path, label, lo, hi):
    """One runstats pass over the PHYSICAL files of a layout: per-file
    min/max/count/match via _metadata.file_path, folded to the
    layout-level pruning verdict."""
    t = spark.read.parquet(path).select(
        "l_shipdate", F.col("_metadata.file_path").alias("f")
    )
    pred = (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") <= hi)
    man = t.groupBy("f").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(pred, 1).otherwise(0)).alias("m"),
        F.when(
            (F.max("l_shipdate") >= lo) & (F.min("l_shipdate") <= hi), 1
        )
        .otherwise(0)
        .alias("sel"),
    )
    return man.agg(
        F.count(F.lit(1)).cast("bigint").alias("files_total"),
        F.sum("sel").cast("bigint").alias("files_selected"),
        F.sum("n").cast("bigint").alias("rows_total"),
        F.sum(F.col("sel") * F.col("n")).cast("bigint").alias("rows_scanned"),
        F.sum("m").cast("bigint").alias("rows_matched"),
        F.when(
            F.sum(F.col("sel") * F.col("m")) == F.sum("m"), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("lossless"),
        quantize(
            F.lit(1.0) - F.sum(F.col("sel") * F.col("n")) / F.sum("n"), 6
        ).alias("skip_frac"),
    ).select(F.lit(label).alias("layout"), "*")


def recluster_layouts(spark, sf_dir, tmp):
    """Write the before (physical-order proxy) and after (advised
    ship-month clustering) layouts under tmp; returns the two paths.
    Shared by the registered query and the plan tests."""
    from skyhookdb_ceph_spark.operators.layout import write_partitioned

    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_shipdate")
    write_partitioned(
        li.withColumn(
            "zone",
            F.floor(F.col("l_orderkey") / _RC_KEY_WIDTH).cast("bigint"),
        ),
        f"{tmp}/before",
        ["zone"],
        ["l_orderkey"],
    )
    write_partitioned(
        li.withColumn("zone", F.date_format("l_shipdate", "yyyy-MM")),
        f"{tmp}/after",
        ["zone"],
        ["l_shipdate"],
    )
    return f"{tmp}/before", f"{tmp}/after"


@query(
    "q_maint_recluster",
    oracle=_rc_oracle(),
    tags=("maintenance", "layout", "scale-design"),
)
def q_maint_recluster(spark, sf_dir):
    """Advisor-driven RE-CLUSTERING — q_scan_zonemap_advisor's verdict
    (ship-month zones prune, orderkey zones don't) turned into the
    physical action, then AUDITED on the physical files: the
    reference's runstats -> sort-on-write maintenance loop end-to-end
    [U: cls_tabular.cc — exec_runstats_op, SIT_IDX_REC sort-on-write].

    Action: operators/layout.write_partitioned re-lays the fact table
    out partitionBy(ship-month) + sortWithinPartitions(l_shipdate) —
    one shuffle, the once-per-maintenance-cycle cost that every later
    date-range scan amortizes.  The before layout (orderkey-bucket
    dirs, orderkey-sorted) is written the same way so the comparison
    is file-format-fair.

    Audit: a runstats pass grouped by `_metadata.file_path` — the
    MEASURED per-file min/max manifest, not a logical zone recompute —
    folds to files_selected / rows_scanned / skip_frac per layout.
    On the fixture the verdict is stark: the after layout scans only
    the predicate's 3 months (skip_frac ~0.96) while the before layout
    selects every file (skip_frac 0.0, shipdate uncorrelated with
    orderkey).  lossless is the zone-map invariant (selected files
    hold ALL matching rows) re-proven on the physical manifest.  The
    oracle recomputes the same verdict from the zone expressions —
    valid because hash-repartitioning on the partition column before
    partitionBy puts each zone in exactly one file (deterministic,
    plan-asserted in tests/test_recluster.py).  At 100 TB the audit
    costs one footer-stat pass per layout; the rewrite is the
    deliberate heavy step, and skip_frac is the number that says
    whether it paid for itself."""
    import shutil
    import tempfile

    lo = F.lit(_RC_LO).cast("timestamp")
    hi = F.lit(f"{_RC_HI} 23:59:59").cast("timestamp")
    from skyhookdb_ceph_spark.queries.scans import _scratch_dir

    tmp = tempfile.mkdtemp(prefix="skyhook_recluster_", dir=_scratch_dir())
    try:
        before, after = recluster_layouts(spark, sf_dir, tmp)
        out = (
            _file_manifest_leg(spark, after, "after_clustered_ship_month", lo, hi)
            .unionByName(
                _file_manifest_leg(
                    spark, before, "before_physical_orderkey", lo, hi
                )
            )
            .orderBy("layout")
        )
        # materialize before the temp layouts vanish (2 verdict rows)
        rows = out.collect()
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# §2.22.2 multi-query shared-scan execution (N filters, ONE corpus pass)
# ---------------------------------------------------------------------------

_SHARED_FILTERS_SQL = {
    "all_docs": "TRUE",
    "lang_en": "lang = 'en'",
    "long_doc": "n_chars >= 300",
    "short_doc": "n_chars < 100",
    "has_digit": "regexp_matches(text, '[0-9]')",
}


def _shared_oracle() -> str:
    legs = []
    for name, pred in _SHARED_FILTERS_SQL.items():
        legs.append(f"""
SELECT '{name}' AS filter,
  CAST(count(*) FILTER (WHERE {pred}) AS BIGINT) AS n_docs,
  CAST(coalesce(sum(n_chars) FILTER (WHERE {pred}), 0) AS BIGINT)
    AS total_chars,
  floor((coalesce(sum(n_chars) FILTER (WHERE {pred}), 0) * 1.0
        / greatest(count(*) FILTER (WHERE {pred}), 1)) * 1000000 + 0.5)
        / 1000000 AS avg_chars
FROM documents""")
    return " UNION ALL ".join(legs) + " ORDER BY filter"


@query(
    "q_scan_shared",
    oracle=_shared_oracle(),
    tags=("scan", "llm", "scale-design"),
)
def q_scan_shared(spark, sf_dir):
    """Multi-query SHARED-SCAN execution: five curation screens
    (language share, length bands, digit boilerplate, the global
    census) computed in ONE pass over the corpus — the inversion of
    the reference's one-query-per-request dispatch [U: run-query.cc]
    that a training-data pipeline needs: at 100 TB the SCAN is the
    cost, and N screens run naively read the table N times.

    operators/shared_scan.shared_filter_profile folds every filter
    into conditional aggregates inside one global aggregate: the plan
    has exactly ONE `Scan parquet` node (plan-asserted,
    tests/test_shared_scan.py) and whole-stage codegen evaluates all
    predicates per row in a single pass — adding a screen adds two
    agg buffers, never a scan.  Measured at sf0.1: BASELINE.md §L.2
    (1-pass vs 5-pass).  The oracle is DuckDB's own shared-scan form
    (FILTER clauses over one table); the Spark avg derives from the
    merged (sum, count) with an explicit empty-filter guard so both
    engines agree on zero-match screens."""
    from skyhookdb_ceph_spark.operators.shared_scan import (
        shared_filter_profile,
    )

    d = Catalog(spark, sf_dir).documents
    filters = {
        "all_docs": F.lit(True),
        "lang_en": F.col("lang") == "en",
        "long_doc": F.col("n_chars") >= 300,
        "short_doc": F.col("n_chars") < 100,
        "has_digit": F.col("text").rlike("[0-9]"),
    }
    prof = shared_filter_profile(d, filters, F.col("n_chars"))
    return prof.select(
        "filter",
        F.col("n_rows").alias("n_docs"),
        F.col("total_value").alias("total_chars"),
        quantize(
            F.col("total_value")
            / F.greatest(F.col("n_rows"), F.lit(1)),
            6,
        ).alias("avg_chars"),
    ).orderBy("filter")


# ---------------------------------------------------------------------------
# §2.22.4 exact-substring span dedup (the Lee et al. 2022 preprocessing)
# ---------------------------------------------------------------------------

_SS_K = 32  # duplicated-substring window, chars (the "50 token" knob)


# spans CTE chain shared by the q_dedup_substring audit and the
# q_transform_strip_dup_spans action (identical span derivation)
def _spans_ctes() -> str:
    k = _SS_K
    return f"""d AS (
  SELECT doc_id, text, length(text) AS n FROM documents
  WHERE text IS NOT NULL AND length(text) >= {k}),
pos AS (
  SELECT doc_id, n, i, substr(text, CAST(i AS INT), {k}) AS g
  FROM d, unnest(generate_series(1, n - {k - 1})) t(i)),
-- duplicated {k}-gram = any second occurrence anywhere in the corpus
-- (including the same document: self-repetition is also removable)
df AS (SELECT g FROM pos GROUP BY g HAVING count(*) > 1),
dup AS (SELECT p.doc_id, p.n, p.i FROM pos p JOIN df USING (g)),
-- interval merge via running max of span ends: a new span starts when
-- this position clears the furthest end seen so far by >1 char
brk AS (
  SELECT doc_id, n, i,
    CASE WHEN i > coalesce(max(i + {k - 1}) OVER (
      PARTITION BY doc_id ORDER BY i
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
    THEN 1 ELSE 0 END AS b
  FROM dup),
grp AS (
  SELECT doc_id, n, i,
    sum(b) OVER (PARTITION BY doc_id ORDER BY i) AS gid
  FROM brk),
spans AS (
  SELECT doc_id, any_value(n) AS n, min(i) AS s, max(i) + {k - 1} AS e
  FROM grp GROUP BY doc_id, gid)"""


def _substring_oracle() -> str:
    return f"""WITH {_spans_ctes()}
SELECT doc_id, count(*) AS n_spans,
  CAST(sum(e - s + 1) AS BIGINT) AS dup_chars,
  floor(sum(e - s + 1) * 1.0 / any_value(n) * 1000000 + 0.5) / 1000000
    AS dup_frac
FROM spans GROUP BY doc_id"""


def _dup_spans(spark, sf_dir):
    """(doc_id, n, s, e) — maximal duplicated-substring spans, the
    Spark twin of _spans_ctes(); shared by the q_dedup_substring audit
    and the q_transform_strip_dup_spans action (and q_pipeline_e2e_v2).

    The three consumers share this CODE (drift impossible) but each
    EXECUTION recomputes the census — documented as the right trade
    for a registry of independently-verifiable oracle-diffed queries
    (BASELINE §P.3): a cross-query persisted census would couple the
    correctness gate's isolated executions.  In production the census
    is a materialized table written once by a maintenance action and
    read by all consumers — the q_dedup_incremental bucketBy-index
    pattern; the per-execution cost a deployment saves by doing so is
    measured per decade in §L.6/§P.3."""
    from pyspark.sql import Window

    k = _SS_K
    d = (
        Catalog(spark, sf_dir)
        .documents.filter(f"text IS NOT NULL AND length(text) >= {k}")
        .selectExpr("doc_id", "text", "length(text) AS n")
    )
    pos = d.select(
        "doc_id",
        "n",
        F.expr(f"explode(sequence(1, n - {k - 1}))").alias("i"),
        F.col("text"),
    ).select(
        "doc_id",
        "n",
        "i",
        F.expr(f"xxhash64(substring(text, i, {k}))").alias("g"),
    )
    # Gram frequency via a COUNT window over the gram key, not
    # groupBy+join-back: the join form computes the position subtree
    # TWICE (once per consumer) and builds a ~distinct-gram-sized
    # partial-agg hash map per task — measured GC-thrash + a
    # superlinear decade at 30x fixture rows (56 s @10x -> 224 s @30x).
    # The window form scans once, shuffles the (doc,n,i,g) rows once on
    # g, and counts inside the sort — sort-based, spill-bounded memory.
    # 8.4/56/224 s became 3.0/22/70/214 s at 1x/10x/30x/100x
    # (BASELINE.md §L.6) — at-or-below linear every decade, and a
    # width probe showed the shape is shuffle-partition-INSENSITIVE
    # at 100x (32/128/256 parts: 214/228/274 s — wider is worse).
    # v1 died outright in the 100x decade.  Trade: a hot
    # gram sorts in one partition (where the join form's map-side
    # combine would absorb it) — acceptable because the downstream
    # interval merge only needs the dup FLAG, and a hot gram's rows
    # are pure sequential sort input, not a hash map.
    w_g = Window.partitionBy("g")
    dup = (
        pos.withColumn("cnt", F.count(F.lit(1)).over(w_g))
        .filter("cnt > 1")
        .select("doc_id", "n", "i")
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    prev_end = (
        F.max(F.col("i") + (k - 1))
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
    )
    brk = dup.withColumn(
        "b",
        F.when(
            F.col("i") > F.coalesce(prev_end, F.lit(-1)) + 1, 1
        ).otherwise(0),
    )
    grp = brk.withColumn("gid", F.sum("b").over(w))
    return grp.groupBy("doc_id", "gid").agg(
        F.first("n").alias("n"),
        F.min("i").alias("s"),
        (F.max("i") + (k - 1)).alias("e"),
    )


@query(
    "q_dedup_substring",
    oracle=_substring_oracle(),
    tags=("llm", "dedup", "scale-design"),
)
def q_dedup_substring(spark, sf_dir):
    """EXACT-SUBSTRING span dedup — per doc, the maximal character
    spans covered by any 32-char window that occurs MORE THAN ONCE in
    the corpus (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better": remove any 50-token substring appearing
    twice; their suffix array re-expressed as relational ops).  Catches
    verbatim boilerplate pasted INSIDE otherwise-unique documents,
    which whole-doc MinHash resemblance misses and containment only
    catches when one doc is mostly inside the other.

    Plan: explode stride-1 32-gram positions -> xxhash64 each window
    (the shuffle carries 8-byte hashes + (doc, pos), never text) ->
    gram frequency via a COUNT window over the gram key (ONE scan, ONE
    corpus-sized shuffle, sort-based so memory is spill-bounded; see
    the inline comment for the measured rejection of the
    groupBy+join-back form) -> per-doc interval merge (running-max
    window over positions, gap > 1 char starts a new span) -> per-doc
    span census.  Never all-pairs: output is linear in duplicated
    positions; both windows are key-bounded.  Measured at-or-below
    linear to 30x fixture rows (BASELINE.md §L.6).  Oracle groups by
    the raw window text where Spark groups by xxhash64 (collision
    odds ~n^2/2^65 — the q_dedup_exact precedent).

    Output: doc_id, n_spans, dup_chars, dup_frac (dup coverage of the
    doc, 1e-6-quantized)."""
    return _dup_spans(spark, sf_dir).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_chars"),
        quantize(
            F.sum(F.col("e") - F.col("s") + 1) / F.first("n"), 6
        ).alias("dup_frac"),
    )


# ---------------------------------------------------------------------------
# §2.22.5 measured LSH recall curve (auditing the r=1 -> r=4 change)
# ---------------------------------------------------------------------------


def _recall_oracle() -> str:
    # DuckDB twin of operators/minhash.recall_curve: same corpus-scaled
    # sample, same salted r=1 reference family, same (8,4) production
    # bands (the FUZZY_SIG_CTES math in wide form), same quantization.
    wide_cols = ",\n    ".join(
        " || ".join(
            f"list_aggregate(list_transform(hs, h -> "
            f"substr(h || h, {b * 4 + j + 1}, 8)), 'min')"
            for j in range(4)
        )
        + f" AS b{b}"
        for b in range(8)
    )
    caught = " OR ".join(f"a.b{b} = c.b{b}" for b in range(8))
    return f"""WITH nn AS (
  SELECT greatest(1, CAST(floor(count(*) / 5000.0) AS BIGINT)) AS m
  FROM documents),
d AS (
  SELECT doc_id, text FROM documents, nn
  WHERE CAST(floor((((doc_id % 2147483647) * 2654435761) % 4294967296)
    / 64.0) AS BIGINT) % m = 0),
sh AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
    i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))
    AS shingles
  FROM d WHERE text IS NOT NULL),
rh AS (
  SELECT doc_id, list_transform(shingles, s -> md5('r1|' || s)) AS hs
  FROM sh),
rsig AS (
  SELECT doc_id, b,
    list_aggregate(list_transform(hs, h -> substr(h || h, b * 4 + 1, 8)),
      'min') AS rsig
  FROM rh, unnest(generate_series(0, 7)) t(b)),
cand AS (
  SELECT DISTINCT a.doc_id AS da, c.doc_id AS db
  FROM rsig a JOIN rsig c
    ON a.b = c.b AND a.rsig = c.rsig AND a.doc_id < c.doc_id),
ph AS (
  SELECT doc_id, list_transform(shingles, s -> md5(s)) AS hs FROM sh),
pw AS (
  SELECT doc_id,
    {wide_cols}
  FROM ph),
j AS (
  SELECT
    floor((len(list_intersect(x.shingles, y.shingles)) * 1.0
      / len(list_distinct(x.shingles || y.shingles))) * 1000000 + 0.5)
      / 1000000 AS jac,
    CASE WHEN {caught} THEN 1 ELSE 0 END AS caught
  FROM cand
  JOIN sh x ON x.doc_id = cand.da
  JOIN sh y ON y.doc_id = cand.db
  JOIN pw a ON a.doc_id = cand.da
  JOIN pw c ON c.doc_id = cand.db)
SELECT floor(jac * 10) / 10 AS j_band,
  count(*) AS truth_pairs,
  CAST(sum(caught) AS BIGINT) AS caught_pairs,
  floor(sum(caught) * 1.0 / count(*) * 1000000 + 0.5) / 1000000 AS recall
FROM j GROUP BY 1 ORDER BY 1"""


@query(
    "q_dedup_minhash_recall",
    oracle=_recall_oracle(),
    tags=("llm", "dedup", "audit", "scale-design"),
)
def q_dedup_minhash_recall(spark, sf_dir):
    """MEASURED recall of the production (b=8, r=4) banded MinHash
    LSH per exact-Jaccard band — the audit owed after round 11 changed
    the detector from r=1 to r=4 on analytic S-curve math alone.
    Ground truth = a PERMISSIVE r=1 reference detector from an
    independent salted hash family over a deterministic corpus-scaled
    doc sample (~5000 docs at any corpus size), the shape production
    recall audits actually use when exact all-pairs is impossible.
    Low-J bands measure the S-curve floor (recall ~0 — those pairs are
    candidate-join poison the r=4 change exists to reject), the
    J>=0.8 bands the operating point (recall ~1).  See
    operators/minhash.recall_curve for the 100 TB argument (sample is
    O(5000) regardless of corpus; never all-pairs)."""
    from skyhookdb_ceph_spark.operators import minhash

    d = Catalog(spark, sf_dir).documents
    return minhash.recall_curve(d)


# ---------------------------------------------------------------------------
# §2.22.6 strip duplicated spans — the ACTION twin of q_dedup_substring
# ---------------------------------------------------------------------------


def _strip_oracle() -> str:
    # Per-character expansion: keep every position not covered by a
    # span, string_agg back in order.  O(corpus chars) rows — fine for
    # an oracle; the Spark side folds the (tiny) span list instead.
    return f"""WITH {_spans_ctes()},
alldocs AS (
  SELECT doc_id, text, length(text) AS n FROM documents
  WHERE text IS NOT NULL),
chars AS (
  SELECT a.doc_id, i, substr(a.text, CAST(i AS INT), 1) AS c
  FROM alldocs a, unnest(generate_series(1, a.n)) t(i)),
kept AS (
  SELECT ch.doc_id, ch.i, ch.c FROM chars ch
  WHERE NOT EXISTS (
    SELECT 1 FROM spans sp
    WHERE sp.doc_id = ch.doc_id AND ch.i BETWEEN sp.s AND sp.e))
SELECT a.doc_id,
  coalesce(k.clean_text, '') AS clean_text,
  CAST(a.n - coalesce(k.kept_chars, 0) AS BIGINT) AS removed_chars
FROM alldocs a LEFT JOIN (
  SELECT doc_id, string_agg(c, '' ORDER BY i) AS clean_text,
    count(*) AS kept_chars
  FROM kept GROUP BY doc_id) k USING (doc_id)"""


@query(
    "q_transform_strip_dup_spans",
    oracle=_strip_oracle(),
    tags=("llm", "dedup", "transform", "scale-design"),
)
def q_transform_strip_dup_spans(spark, sf_dir):
    """The ACTION twin of q_dedup_substring: actually REMOVE every
    duplicated 32-char span from every document (Lee et al. 2022's
    cleaning step — they delete ALL occurrences of a duplicated
    window, including the first), returning the cleaned corpus.  The
    q_maint_recluster pattern applied to dedup: the audit says WHERE
    the boilerplate is, this op produces the corpus without it.

    Plan: _dup_spans (shared with the audit — spans are maximal,
    non-overlapping, sorted) -> collect the per-doc span list (tiny:
    bounded by doc length / 32) -> one aggregate() fold per doc
    rebuilds the residual string from the gaps between spans — pure
    whole-stage-codegen string ops, one pass per doc, no per-char
    explosion.  Docs with no duplicated span pass through unchanged
    via the left join.  At 100 TB this is a map-shaped transform
    (write back to storage, never collect); the only shuffles are the
    audit's own (gram df + doc-keyed merge).  Oracle rebuilds the
    residual per-character (string_agg over uncovered positions) —
    same answer, oracle-only cost.

    Output: doc_id, clean_text, removed_chars."""
    spans = _dup_spans(spark, sf_dir)
    per_doc = spans.groupBy("doc_id").agg(
        F.expr("array_sort(collect_list(struct(s, e)))").alias("sp")
    )
    docs = (
        Catalog(spark, sf_dir)
        .documents.filter("text IS NOT NULL")
        .selectExpr("doc_id", "text", "length(text) AS n")
    )
    joined = docs.join(per_doc, "doc_id", "left")
    # fold the span list: state = (next uncovered position, accumulated
    # clean text); each span appends the gap before it and jumps past
    # it; finish() appends the tail after the last span
    fold = (
        "aggregate("
        # typed empty array: a bare array() is array<string> and only
        # works here via implicit coercion — pin the element struct
        "  coalesce(sp, CAST(array() AS array<struct<s: int, e: int>>)),"
        "  struct(1 AS pos, '' AS acc),"
        "  (st, x) -> struct("
        "    CAST(x.e + 1 AS INT) AS pos,"
        "    concat(st.acc, substring(text, st.pos, x.s - st.pos)) AS acc),"
        "  st -> concat(st.acc, substring(text, st.pos, n - st.pos + 1))"
        ")"
    )
    # project the fold ONCE, then derive removed_chars from its length
    # in a chained select — inlining the fold twice would make Catalyst
    # evaluate the full per-doc string rebuild twice per row unless CSE
    # happens to fire
    return joined.selectExpr("doc_id", "n", f"{fold} AS clean_text").selectExpr(
        "doc_id",
        "clean_text",
        "CAST(n - length(clean_text) AS BIGINT) AS removed_chars",
    )
