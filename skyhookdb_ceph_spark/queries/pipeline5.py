"""Round-4 wave-3 operators (SURVEY.md §2.15 continued) — relational
reshaping (unpivot/melt), table profiling (multi-column statistics),
product analytics (activity bitmaps, cohort retention), proximity
search, and canonicalization dedup.

Same house rules as pipeline4.py: deterministic, engine-invariant
quantization, identical aliases both sides, unique tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from skyhookdb_ceph_spark.operators import ensure_parallelism
from skyhookdb_ceph_spark.queries._util import Catalog, quantize, quantize2
from skyhookdb_ceph_spark.registry import query

# ---------------------------------------------------------------------------
# §2.15.23 Unpivot / melt (wide -> long)
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
       floor(l_quantity * 1000000 + 0.5) / 1000000 AS val
FROM lineitem WHERE l_orderkey % 50 = 0
UNION ALL
SELECT l_orderkey, l_linenumber, 'price',
       floor(l_extendedprice * 1000000 + 0.5) / 1000000
FROM lineitem WHERE l_orderkey % 50 = 0
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount',
       floor(l_discount * 1000000 + 0.5) / 1000000
FROM lineitem WHERE l_orderkey % 50 = 0
UNION ALL
SELECT l_orderkey, l_linenumber, 'tax',
       floor(l_tax * 1000000 + 0.5) / 1000000
FROM lineitem WHERE l_orderkey % 50 = 0
"""


@query("q_fn_unpivot", oracle=_UNPIVOT_ORACLE, tags=("functions", "reshape"))
def q_fn_unpivot(spark, sf_dir):
    """Unpivot / melt: four measure columns to (metric, val) rows via
    stack() — the inverse of q_agg_pivot, a single Generate over the
    scan (pure map, no shuffle; the 4x row fan-out is the contract).
    The oracle states the same reshape as UNION ALL.  Deterministic
    1/50 orderkey thinning keeps the long output bounded."""
    li = Catalog(spark, sf_dir).lineitem.filter(
        F.expr("l_orderkey % 50 = 0")
    )
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(4, "
        "'quantity', floor(l_quantity * 1000000 + 0.5) / 1000000, "
        "'price', floor(l_extendedprice * 1000000 + 0.5) / 1000000, "
        "'discount', floor(l_discount * 1000000 + 0.5) / 1000000, "
        "'tax', floor(l_tax * 1000000 + 0.5) / 1000000"
        ") AS (metric, val)",
    )


# ---------------------------------------------------------------------------
# §2.15.24 Multi-column table profiling (ANALYZE-style summary)
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            f"SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count(*) - count({c}) AS BIGINT) AS n_null, "
            f"floor(min({c}) * 1000000 + 0.5) / 1000000 AS min_val, "
            f"floor(max({c}) * 1000000 + 0.5) / 1000000 AS max_val, "
            f"floor(avg({c}) * 1000000 + 0.5) / 1000000 AS avg_val "
            f"FROM lineitem"
        )
    return " UNION ALL ".join(parts)


@query("q_stats_profile", oracle=_profile_oracle(), tags=("stats",))
def q_stats_profile(spark, sf_dir):
    """Table profiling: per-column row/null counts, min/max/mean for
    every numeric measure — the reference's ANALYZE/statistics pass as
    one query.  ALL columns profile in a SINGLE scan (one partial
    aggregate computing 4x5 states), then the wide 1-row aggregate
    unpivots via stack() — at 100 TB this is one pass over the table
    instead of one per column, which is the entire point."""
    li = Catalog(spark, sf_dir).lineitem
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nn"),
            quantize(F.min(c), 6).alias(f"{c}__mn"),
            quantize(F.max(c), 6).alias(f"{c}__mx"),
            quantize(F.avg(c), 6).alias(f"{c}__av"),
        ]
    wide = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__n, {c}__nn, {c}__mn, {c}__mx, {c}__av"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) AS "
        "(col_name, n_rows, n_null, min_val, max_val, avg_val)"
    )


# ---------------------------------------------------------------------------
# §2.15.25 Activity bitmaps (retention-style bit aggregation)
# ---------------------------------------------------------------------------

_BITMAP_ORACLE = """
SELECT user_id,
  bit_or(CAST(1 AS BIGINT) << CAST(date_diff('day', DATE '2024-01-01',
                                             CAST(ts AS DATE)) AS INT))
    AS day_bitmap,
  CAST(bit_count(bit_or(CAST(1 AS BIGINT) <<
    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT)))
    AS BIGINT) AS active_days
FROM events GROUP BY user_id ORDER BY user_id
"""


@query("q_agg_retention_bitmap", oracle=_BITMAP_ORACLE, tags=("analytics",))
def q_agg_retention_bitmap(spark, sf_dir):
    """Per-user activity bitmap: day-of-month presence packed into one
    BIGINT via bit_or(1 << day_offset), active-day count via
    bit_count — the constant-width retention/engagement encoding (a
    31-day user history is 8 bytes regardless of event volume, and
    bitmaps AND/OR across periods for cohort algebra).  One partial
    bit_or aggregate; integers only, so cross-engine parity is
    exact."""
    ev = Catalog(spark, sf_dir).events
    off = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    )
    bit = F.expr(
        "shiftleft(CAST(1 AS BIGINT), "
        "datediff(CAST(ts AS DATE), DATE '2024-01-01'))"
    )
    return (
        ev.groupBy("user_id")
        .agg(F.bit_or(bit).alias("day_bitmap"))
        .select(
            "user_id",
            "day_bitmap",
            F.bit_count("day_bitmap").cast("bigint").alias("active_days"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# §2.15.26 Cohort retention triangle
# ---------------------------------------------------------------------------

_COHORT_ORACLE = """
WITH act AS (
  SELECT DISTINCT user_id,
    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d
  FROM events),
cohort AS (SELECT user_id, min(d) AS c0 FROM act GROUP BY user_id)
SELECT c0 AS cohort_day, a.d - c.c0 AS day_k,
  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM act a JOIN cohort c ON a.user_id = c.user_id
WHERE a.d - c.c0 <= 7
GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("q_win_retention_cohort", oracle=_COHORT_ORACLE, tags=("analytics",))
def q_win_retention_cohort(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-activity day,
    counted on each of their next 7 active days — the standard
    retention matrix.  (user, day) distinct first (one keyed partial
    agg collapses event volume to at most users x days rows), cohort
    day via a per-user min re-joined on user_id; the final count is a
    (cohort, k) aggregate.  Every stage shuffles on bounded
    cardinalities, never raw events."""
    ev = Catalog(spark, sf_dir).events
    act = (
        ev.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            )
            .cast("bigint")
            .alias("d"),
        )
        .distinct()
    )
    cohort = act.groupBy("user_id").agg(F.min("d").alias("c0"))
    return (
        act.join(cohort, "user_id")
        .withColumn("day_k", F.col("d") - F.col("c0"))
        .filter(F.col("day_k") <= 7)
        .groupBy(F.col("c0").alias("cohort_day"), "day_k")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_active"))
        .orderBy("cohort_day", "day_k")
    )


# ---------------------------------------------------------------------------
# §2.15.27 Term-proximity search (positional postings)
# ---------------------------------------------------------------------------

_PROXIMITY_ORACLE = """
WITH pos AS (
  SELECT doc_id, t.w, CAST(t.i AS BIGINT) AS p
  FROM (SELECT doc_id,
          unnest(string_split(text, ' ')) AS w,
          unnest(generate_series(1, len(string_split(text, ' ')))) AS i
        FROM documents) t(doc_id, w, i)
  WHERE t.w IN ('spark', 'query')),
a AS (SELECT doc_id, p FROM pos WHERE w = 'spark'),
b AS (SELECT doc_id, p FROM pos WHERE w = 'query')
SELECT a.doc_id, CAST(min(abs(a.p - b.p)) AS BIGINT) AS min_gap
FROM a JOIN b ON a.doc_id = b.doc_id
GROUP BY a.doc_id HAVING min(abs(a.p - b.p)) <= 3
ORDER BY a.doc_id
"""


@query("q_text_proximity", oracle=_PROXIMITY_ORACLE, tags=("llm", "text"))
def q_text_proximity(spark, sf_dir):
    """Proximity search: documents where 'spark' and 'query' occur
    within 3 words, with the minimum gap — the positional-postings
    operator behind phrase/NEAR queries (reference IDX_TXT keeps word
    positions for exactly this [U: cls_tabular IDX_TXT]).  Postings
    are filtered to the two query terms AT THE EXPLODE (the full
    position list never shuffles); the per-doc pair join is bounded by
    per-doc term frequency, not document length."""
    d = ensure_parallelism(Catalog(spark, sf_dir).documents)
    pos = (
        d.selectExpr("doc_id", "posexplode(split(text, ' ')) AS (p0, w)")
        .filter(F.col("w").isin("spark", "query"))
        .selectExpr("doc_id", "w", "CAST(p0 + 1 AS BIGINT) AS p")
    )
    a = pos.filter("w = 'spark'").selectExpr("doc_id", "p AS pa")
    b = pos.filter("w = 'query'").selectExpr("doc_id AS db", "p AS pb")
    return (
        a.join(b, F.col("doc_id") == F.col("db"))
        .groupBy("doc_id")
        .agg(
            F.min(F.abs(F.col("pa") - F.col("pb")))
            .cast("bigint")
            .alias("min_gap")
        )
        .filter(F.col("min_gap") <= 3)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# §2.15.28 Canonicalization (casefold) dedup
# ---------------------------------------------------------------------------

_CASEFOLD_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, upper(text) || '!!' FROM documents
  WHERE doc_id % 7 = 0),
canon AS (
  SELECT doc_id,
    trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')) AS raw1
  FROM corpus),
canon2 AS (
  SELECT doc_id, regexp_replace(raw1, ' +', ' ', 'g') AS ctext FROM canon)
SELECT md5(ctext) AS canon_md5, min(doc_id) AS keep_id,
  CAST(count(*) AS BIGINT) AS dup_cnt
FROM canon2 GROUP BY ctext HAVING count(*) > 1
ORDER BY keep_id
"""


@query("q_dedup_casefold", oracle=_CASEFOLD_ORACLE, tags=("llm", "dedup"))
def q_dedup_casefold(spark, sf_dir):
    """Canonicalization dedup: lowercase, strip non-alphanumerics,
    collapse whitespace, then exact-match on the canonical form —
    catches formatting-only duplicates (case, punctuation, spacing)
    that hash-exact dedup misses and MinHash wastes bands on.  Only
    (canonical-md5, id) pairs shuffle; the group carries the digest,
    never the text.  Spark's regexp_replace is global by default; the
    oracle passes the 'g' flag for identical semantics.  A synthetic
    variant set (every 7th doc uppercased with trailing punctuation)
    guarantees the fixture exercises hits deterministically."""
    d = Catalog(spark, sf_dir).documents
    variants = d.filter(F.expr("doc_id % 7 = 0")).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("!!")).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(variants)
    d = ensure_parallelism(corpus)
    canon = d.select(
        "doc_id",
        F.trim(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " ")
        ).alias("raw1"),
    ).select(
        "doc_id",
        F.regexp_replace(F.col("raw1"), " +", " ").alias("ctext"),
    )
    return (
        canon.groupBy("ctext")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
        .filter(F.col("dup_cnt") > 1)
        .select(F.md5("ctext").alias("canon_md5"), "keep_id", "dup_cnt")
        .orderBy("keep_id")
    )
