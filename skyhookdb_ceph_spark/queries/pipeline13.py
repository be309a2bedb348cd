"""Round-12 wave (SURVEY.md §2.23).

Closing the r11 verdict's action items:

1. q_transform_dedup_corpus — the whole-doc ACTION the audit->action
   pattern was still missing: take the near-dup CLUSTER verdicts
   (q_dedup_fuzzy pairs -> q_dedup_cluster labels, the exact shared
   derivation) and EMIT the deduplicated corpus — cluster-canonical
   survivor selection plus the dropped-doc manifest, in one result.

2. q_pipeline_e2e_v2 — the end-to-end curation pipeline recomposed
   with the round-11 operators folded in: shared-scan screens, exact
   dedup, cascade quality gate, split assignment and token accounting
   in ONE plan over ONE corpus scan before the dedup shuffle.

House rules unchanged: identical aliases both sides, deterministic
everything (canonical choice is a total order: chars desc, doc_id
asc), no all-pairs, no corpus-sized collect() — the dedup-corpus
output is a corpus-shaped TRANSFORM a deployment writes back to
storage instead of collecting.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from skyhookdb_ceph_spark.queries._util import Catalog, quantize
from skyhookdb_ceph_spark.registry import query

# ---------------------------------------------------------------------------
# §2.23.1 corpus-level dedup ACTION: survivors + dropped-doc manifest
# ---------------------------------------------------------------------------


def _dedup_corpus_oracle() -> str:
    # Shared CTE chain with q_dedup_fuzzy/q_dedup_cluster (labels =
    # the identical pair derivation + 2-round min-label propagation),
    # then the same total-order survivor window as the Spark side.
    from skyhookdb_ceph_spark.queries.pipeline import cluster_label_ctes

    return f"""WITH {cluster_label_ctes()},
feat AS (
  SELECT doc_id, CAST(coalesce(length(text), 0) AS BIGINT) AS n_chars
  FROM documents),
ranked AS (
  SELECT l.doc_id, l.cluster, f.n_chars,
    first_value(l.doc_id) OVER w AS canonical_id,
    row_number() OVER w AS rn
  FROM labels l JOIN feat f USING (doc_id)
  WINDOW w AS (PARTITION BY l.cluster
               ORDER BY f.n_chars DESC, l.doc_id))
SELECT doc_id, cluster, n_chars, canonical_id,
  CASE WHEN rn = 1 THEN 'kept' ELSE 'dropped' END AS status
FROM ranked"""


@query(
    "q_transform_dedup_corpus",
    oracle=_dedup_corpus_oracle(),
    tags=("llm", "dedup", "transform", "scale-design"),
)
def q_transform_dedup_corpus(spark, sf_dir):
    """The whole-document dedup ACTION (r11 verdict item 4): turn the
    near-dup cluster verdicts into the deduplicated corpus.  Survivor
    selection is cluster-canonical with a DETERMINISTIC total order —
    keep the doc with the most characters (most content survives,
    the choice production dedup stacks make), doc_id ascending as the
    tie-break — and every dropped doc carries a pointer to the
    canonical survivor that replaces it (the manifest a downstream
    training run needs to audit what was removed and why).

    Plan: cluster_labels (the EXACT derivation q_dedup_cluster runs —
    shared helper, so audit and action cannot drift) -> doc_id-keyed
    join to per-doc char counts -> ONE keyed shuffle on cluster for
    the survivor window (row_number + first_value share a single
    window spec, one Exchange+Sort).  Beyond the existing pair/label
    derivation the action adds exactly that one cluster-keyed
    shuffle, plan-asserted in tests/test_plans.py.  Window width is
    bounded by cluster size (near-dup clusters are small by
    construction; LSH banding caps the pair fan-in), so no skew
    pathology at corpus scale.  At 100 TB this is a map-shaped
    transform over the labeled corpus: survivors stream to the
    cleaned dataset, dropped rows to the manifest — write back to
    storage, never collect.

    Output: doc_id, cluster, n_chars, canonical_id (= doc_id for
    kept rows), status ('kept' | 'dropped')."""
    from skyhookdb_ceph_spark.queries.pipeline import cluster_labels

    labels = cluster_labels(spark, sf_dir)
    feat = Catalog(spark, sf_dir).documents.selectExpr(
        "doc_id", "CAST(coalesce(length(text), 0) AS BIGINT) AS n_chars"
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        labels.join(feat, "doc_id")
        .select(
            "doc_id",
            "cluster",
            "n_chars",
            F.first("doc_id").over(w).alias("canonical_id"),
            F.row_number().over(w).alias("rn"),
        )
        .selectExpr(
            "doc_id",
            "cluster",
            "n_chars",
            "canonical_id",
            "CASE WHEN rn = 1 THEN 'kept' ELSE 'dropped' END AS status",
        )
    )
