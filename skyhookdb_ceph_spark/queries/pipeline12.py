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

House rules unchanged: identical aliases both sides, deterministic
everything, no all-pairs, no corpus-sized collect() — driver-side
materializations are verdict-table-sized (2-N rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from skyhookdb_ceph_spark.queries._util import Catalog, quantize
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
    tmp = tempfile.mkdtemp(prefix="skyhook_recluster_")
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
        return spark.createDataFrame(rows, out.schema)
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
