"""Round-9 wave (SURVEY.md §2.20).

Closing the r8 verdict's stretch items with measured-statistics
machinery applied to NEW plan families:

1. q_win_density_blocks — the second consumer of the measured-stats
   machinery (r8 verdict item 9): a per-type trailing RANGE window
   whose day-block decomposition width is PICKED FROM a 1-row density
   probe (operators/stats.measured_block_width), falling back to the
   plain per-type window when the measured density says decomposition
   buys no parallelism.  Both branches return identical rows; the
   oracle is the plain global window and never needs to know which
   branch ran.  Plan shape for both branches is pinned in
   tests/test_plans.py.

House rules unchanged: identical aliases both sides, deterministic
everything, no all-pairs, no corpus-sized collect() — the probe's
driver-side materialization is ONE row.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from skyhookdb_ceph_spark.operators.stats import measured_block_width
from skyhookdb_ceph_spark.queries._util import Catalog
from skyhookdb_ceph_spark.registry import query

# ---------------------------------------------------------------------------
# §2.20.1 density-probed window-block planning
# ---------------------------------------------------------------------------

_DENSITY_ORACLE = """
WITH s AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events WHERE user_id < 50)
SELECT event_type, sec,
  CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
  CAST(max(cents) OVER w AS BIGINT) AS max_cents_last_hour
FROM s
WINDOW w AS (PARTITION BY event_type ORDER BY sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
ORDER BY event_type, sec, n_last_hour, max_cents_last_hour
"""

_FRAME_SEC = 3600
_TARGET_ROWS_PER_BLOCK = 128


def _trailing_hour_window(spark, sf_dir, target_rows):
    """Shared body so tests can force either branch via target_rows
    (tiny target -> narrow blocks; huge target -> plain window)."""
    e = Catalog(spark, sf_dir).events.filter(F.col("user_id") < 50)
    s = e.select(
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("sec"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    width = measured_block_width(
        s, "event_type", "sec", _FRAME_SEC, target_rows
    )
    if width is None:
        # plain per-type window: the measured density says block
        # decomposition would not buy parallelism worth the ghosts
        w = (
            Window.partitionBy("event_type")
            .orderBy("sec")
            .rangeBetween(-_FRAME_SEC, 0)
        )
        windowed = s
    else:
        # day-block decomposition at the MEASURED width: rows from the
        # trailing frame of each block are duplicated into the next
        # block as contributor-only ghosts (emit=0) so every frame is
        # block-local; parallelism becomes types x (span/width) tasks
        s = s.withColumn("blk", F.floor(F.col("sec") / width))
        real = s.withColumn("emit", F.lit(1))
        ghost = (
            # pmod, not %: Spark's % follows the dividend's sign, so for
            # negative sec (pre-1970) it would disagree with the
            # floor(sec/width) block assignment and break the
            # ghost-row equivalence invariant.
            s.filter(F.pmod(F.col("sec"), F.lit(width)) >= width - _FRAME_SEC)
            .withColumn("blk", F.col("blk") + 1)
            .withColumn("emit", F.lit(0))
        )
        windowed = real.unionByName(ghost)
        w = (
            Window.partitionBy("event_type", "blk")
            .orderBy("sec")
            .rangeBetween(-_FRAME_SEC, 0)
        )
    out = windowed.select(
        "event_type",
        "sec",
        *(["emit"] if width is not None else []),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_last_hour"),
        F.max("cents").over(w).cast("bigint").alias("max_cents_last_hour"),
    )
    if width is not None:
        out = out.filter(F.col("emit") == 1).drop("emit")
    return out.orderBy(
        "event_type", "sec", "n_last_hour", "max_cents_last_hour"
    )


@query(
    "q_win_density_blocks",
    oracle=_DENSITY_ORACLE,
    tags=("window", "timeseries", "scale-design", "stats-driven"),
)
def q_win_density_blocks(spark, sf_dir):
    """Trailing-hour rolling count/max whose PHYSICAL window layout is
    chosen from a measured density probe — the window-planning
    consumer of the measured-statistics machinery (skew.max_key_share
    drives the agg and join branches; stats.measured_block_width
    drives this one).

    The probe (one map-combined job, one driver row) measures the
    densest event_type's row count and the time span; the RANGE
    window is then decomposed into time blocks sized so a
    (type, block) task holds ~128 rows of the densest type — or left
    as the plain per-type window when the measured width would cover
    the whole span (sparse data: decomposition pays ghost-row
    duplication for no parallelism).  Both branches return identical
    rows (the q_win_trailing_hour ghost-row argument: width >= frame
    means a frame reaches at most one block back, ghosts can never
    tie with real rows on sec), so the oracle is the plain global
    window either way.  At 100 TB this is the difference between one
    task per type and types x days parallelism — chosen from the
    post-filter density no static file stat can see."""
    return _trailing_hour_window(spark, sf_dir, _TARGET_ROWS_PER_BLOCK)


# ---------------------------------------------------------------------------
# §2.20.2 higher-order array lambdas (filter / exists / forall / indexed)
# ---------------------------------------------------------------------------

_HOF_ORACLE = """
SELECT vec_id,
  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
  CAST(len(list_filter(embedding, x -> abs(x) > 2)) > 0 AS BOOLEAN)
    AS has_big,
  CAST(len(list_filter(embedding, x -> abs(x) >= 10)) = 0 AS BOOLEAN)
    AS all_small,
  floor((list_aggregate(list_transform(generate_series(1, len(embedding)),
      i -> CAST(embedding[i] AS DOUBLE) * (i - 1)), 'sum'))
    * 1000000 + 0.5) / 1000000 AS idx_weighted
FROM embeddings
"""


@query("q_fn_higher_order", oracle=_HOF_ORACLE, tags=("function", "array"))
def q_fn_higher_order(spark, sf_dir):
    """The higher-order-lambda surface q_fn_array's transform/aggregate
    pair leaves open: filter (keep positive components), exists (any
    |x| > 2), forall (all |x| < 10), and a position-aware reduction
    (sum of x_i * i via zip_with against a sequence).  All four are
    Catalyst lambda expressions — JVM-evaluated inside whole-stage
    codegen, no Python worker, no explode: the per-row array never
    becomes 64 rows.  At 100 TB that is the difference between a map
    over n rows and a shuffle-prone explode into n x dim rows."""
    e = Catalog(spark, sf_dir).embeddings
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    idx = F.sequence(F.lit(0), F.size("embedding") - 1)
    from skyhookdb_ceph_spark.queries._util import quantize

    return e.select(
        "vec_id",
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
        F.exists(F.col("embedding"), lambda x: F.abs(x) > 2).alias(
            "has_big"
        ),
        F.forall(F.col("embedding"), lambda x: F.abs(x) < 10).alias(
            "all_small"
        ),
        quantize(
            F.aggregate(
                F.zip_with(emb_d, idx, lambda x, i: x * i.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        ).alias("idx_weighted"),
    )


# ---------------------------------------------------------------------------
# §2.20.3 higher central moments as mergeable power sums
# ---------------------------------------------------------------------------

_MOMENTS_ORACLE = """
WITH s AS (
  SELECT event_type, value / 100 AS v FROM events),
p AS (
  SELECT event_type,
         count(*) AS n, sum(v) AS s1, sum(v*v) AS s2,
         sum(v*v*v) AS s3, sum(v*v*v*v) AS s4
  FROM s GROUP BY event_type)
SELECT event_type, CAST(n AS BIGINT) AS n,
  floor((s1/n) * 1000000 + 0.5) / 1000000 AS mean_v,
  floor((
    (s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
    / pow(s2/n - (s1/n)*(s1/n), 1.5)
  ) * 100000 + 0.5) / 100000 AS skew_v,
  floor((
    (s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
     - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
    / pow(s2/n - (s1/n)*(s1/n), 2) - 3
  ) * 10000 + 0.5) / 10000 AS kurt_v
FROM p ORDER BY event_type
"""


@query("q_agg_moments", oracle=_MOMENTS_ORACLE, tags=("agg", "scale-design"))
def q_agg_moments(spark, sf_dir):
    """Skewness and excess kurtosis per event_type computed from RAW
    POWER SUMS (n, Σv, Σv², Σv³, Σv⁴) rather than the engines' builtin
    skewness()/kurtosis() — deliberately: Spark's builtins are
    population-form while DuckDB's carry sample-bias corrections, so
    the builtins can never hash-match; the power-sum arithmetic is
    identical IEEE ops in both engines.  That choice IS the scale
    story: power sums are the mergeable-sketch form of higher moments
    (combine by addition — the same partial/final shape as sum/count),
    so the whole statistic is ONE map-combined pass with a 5-number
    state per key, where a two-pass mean-then-deviations design would
    re-scan the corpus.  Values are pre-scaled by 100 (skew/kurt are
    scale-invariant) so the quartic sums stay ~1e7 and summation-order
    drift stays below the 5/4-decimal quantization."""
    e = Catalog(spark, sf_dir).events
    from skyhookdb_ceph_spark.queries._util import quantize

    v = F.col("value") / 100
    p = e.select("event_type", v.alias("v")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.sum(F.col("v") * F.col("v") * F.col("v")).alias("s3"),
        F.sum(F.col("v") * F.col("v") * F.col("v") * F.col("v")).alias(
            "s4"
        ),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu
    m4 = (
        s4 / n
        - 4 * mu * (s3 / n)
        + 6 * mu * mu * (s2 / n)
        - 3 * mu * mu * mu * mu
    )
    return p.select(
        "event_type",
        n.cast("bigint").alias("n"),
        quantize(mu, 6).alias("mean_v"),
        quantize(m3 / F.pow(m2, 1.5), 5).alias("skew_v"),
        quantize(m4 / F.pow(m2, 2.0) - 3, 4).alias("kurt_v"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# §2.20.4 k-anonymity generalization ladder
# ---------------------------------------------------------------------------

_KANON_K = 10

_KANON_ORACLE = f"""
WITH g AS (
  SELECT c_custkey, c_mktsegment,
    count(*) OVER (PARTITION BY c_nationkey, c_mktsegment,
                   floor(c_acctbal / 1000)) AS n0,
    count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n1,
    count(*) OVER (PARTITION BY c_mktsegment) AS n2,
    c_nationkey, floor(c_acctbal / 1000) AS bal_kb
  FROM customer),
lv AS (
  SELECT c_custkey, c_mktsegment, c_nationkey, bal_kb,
    CASE WHEN n0 >= {_KANON_K} THEN 0
         WHEN n1 >= {_KANON_K} THEN 1
         WHEN n2 >= {_KANON_K} THEN 2
         ELSE 3 END AS level,
    CASE WHEN n0 >= {_KANON_K} THEN n0
         WHEN n1 >= {_KANON_K} THEN n1
         WHEN n2 >= {_KANON_K} THEN n2
         ELSE 0 END AS gsize
  FROM g)
SELECT level, CAST(count(*) AS BIGINT) AS n_records,
  CAST(count(DISTINCT CASE level
    WHEN 0 THEN CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment
                 || '|' || CAST(bal_kb AS VARCHAR)
    WHEN 1 THEN CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment
    WHEN 2 THEN c_mktsegment ELSE '*' END) AS BIGINT) AS n_groups,
  CAST(min(gsize) AS BIGINT) AS min_group_size
FROM lv GROUP BY level ORDER BY level
"""


@query("q_gdpr_anonymize", oracle=_KANON_ORACLE, tags=("privacy",))
def q_gdpr_anonymize(spark, sf_dir):
    """k-anonymity via a generalization LADDER — the third privacy
    primitive after q_gdpr_delete / q_gdpr_export: every released
    record must be indistinguishable from >= k-1 others on its
    quasi-identifiers (nation, segment, account-balance bucket).
    Records whose finest generalization (nation, segment, $1000
    bucket) already forms a group of >= k release at level 0; smaller
    groups coarsen to (nation, segment), then (segment), then full
    suppression.  The verdict row per level carries the released-group
    count and the min group size — which must be >= k on every
    non-suppressed level BY CONSTRUCTION, the invariant the oracle
    re-derives independently (its window-count formulation and this
    plan are two independent derivations of the same ladder).

    Scale shape — deliberately NOT window counts: a window partitioned
    by the quasi-identifiers would exchange the FULL record stream
    three times (and the segment-only window caps parallelism at
    |segments| tasks).  Group sizes are instead three map-combined
    aggregates — bounded by the quasi-identifier DOMAIN, which is
    small by definition or k-anonymity is unattainable — broadcast
    back onto the records: ZERO fact shuffles before the final
    level-keyed aggregate.  tests/test_plans.py pins the
    broadcast-only shape."""
    c = Catalog(spark, sf_dir).customer
    g = c.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).alias("bal_kb"),
    )
    s0 = g.groupBy(
        F.col("c_nationkey").alias("k0n"),
        F.col("c_mktsegment").alias("k0s"),
        F.col("bal_kb").alias("k0b"),
    ).agg(F.count(F.lit(1)).alias("n0"))
    s1 = g.groupBy(
        F.col("c_nationkey").alias("k1n"), F.col("c_mktsegment").alias("k1s")
    ).agg(F.count(F.lit(1)).alias("n1"))
    s2 = g.groupBy(F.col("c_mktsegment").alias("k2s")).agg(
        F.count(F.lit(1)).alias("n2")
    )
    joined = (
        g.join(
            F.broadcast(s0),
            (F.col("c_nationkey") == F.col("k0n"))
            & (F.col("c_mktsegment") == F.col("k0s"))
            & (F.col("bal_kb") == F.col("k0b")),
        )
        .join(
            F.broadcast(s1),
            (F.col("c_nationkey") == F.col("k1n"))
            & (F.col("c_mktsegment") == F.col("k1s")),
        )
        .join(F.broadcast(s2), F.col("c_mktsegment") == F.col("k2s"))
    )
    n0, n1, n2 = F.col("n0"), F.col("n1"), F.col("n2")
    k = _KANON_K
    lv = joined.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        "bal_kb",
        F.when(n0 >= k, 0)
        .when(n1 >= k, 1)
        .when(n2 >= k, 2)
        .otherwise(3)
        .alias("level"),
        F.when(n0 >= k, n0)
        .when(n1 >= k, n1)
        .when(n2 >= k, n2)
        .otherwise(0)
        .alias("gsize"),
    )
    gkey = (
        F.when(
            F.col("level") == 0,
            F.concat_ws(
                "|", "c_nationkey", "c_mktsegment", "bal_kb"
            ),
        )
        .when(
            F.col("level") == 1,
            F.concat_ws("|", "c_nationkey", "c_mktsegment"),
        )
        .when(F.col("level") == 2, F.col("c_mktsegment"))
        .otherwise(F.lit("*"))
    )
    return (
        lv.withColumn("gkey", gkey)
        .groupBy("level")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_records"),
            F.countDistinct("gkey").cast("bigint").alias("n_groups"),
            F.min("gsize").cast("bigint").alias("min_group_size"),
        )
        .orderBy("level")
    )


# ---------------------------------------------------------------------------
# §2.20.5 deterministic Poisson bootstrap resampling
# ---------------------------------------------------------------------------

# Poisson(1) CDF thresholds for k = 0..6 (e^-1 * sum 1/i!); u >= last
# threshold draws k = 7.  Identical literals on both sides.
_POIS_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
]

_POISSON_ORACLE = f"""
WITH u AS (
  SELECT event_type, value,
    (CAST(((event_id % 2147483647) * 2654435761) % 4294967296 AS DOUBLE)
      / 4294967296) AS u
  FROM events),
k AS (
  SELECT event_type, value,
    CASE
      WHEN u < {_POIS_CDF[0]} THEN 0 WHEN u < {_POIS_CDF[1]} THEN 1
      WHEN u < {_POIS_CDF[2]} THEN 2 WHEN u < {_POIS_CDF[3]} THEN 3
      WHEN u < {_POIS_CDF[4]} THEN 4 WHEN u < {_POIS_CDF[5]} THEN 5
      WHEN u < {_POIS_CDF[6]} THEN 6 ELSE 7 END AS k
  FROM u)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_orig,
  CAST(sum(k) AS BIGINT) AS n_resampled,
  CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
  floor((sum(value * k)) * 100 + 0.5) / 100 AS resampled_value
FROM k GROUP BY event_type ORDER BY event_type
"""


@query(
    "q_sample_poisson", oracle=_POISSON_ORACLE, tags=("sampling",)
)
def q_sample_poisson(spark, sf_dir):
    """Poisson(1) bootstrap resampling — the bagging/ensemble
    primitive: each row enters the resample k times with
    k ~ Poisson(1), drawn DETERMINISTICALLY by inverting the Poisson
    CDF at a Knuth-hash uniform of the row id (no RNG, reruns and the
    oracle agree bit-for-bit; same multiplier as q_pipeline_e2e's
    split).  This is how you bootstrap a 100 TB table: the classic
    sample-n-of-n WITH replacement needs global row addressing
    (n random indexes -> which partition holds row i? a shuffle per
    resample); per-row Poisson counts are i.i.d.-equivalent for
    n -> inf and embarrassingly parallel — a pure map, no shuffle
    until the final keyed aggregate.  Verdict columns: replicate
    total (E[k]=1 so ~n_orig), dropped fraction (E ~ 36.8 %), and the
    k-weighted value sum."""
    e = Catalog(spark, sf_dir).events
    # pre-mod by 2^31-1: overflow guard for huge ids (r12 scale
    # smoke, BASELINE.md §L.7)
    u = (
        ((F.col("event_id") % 2147483647) * F.lit(2654435761)
         % F.lit(4294967296))
        .cast("double")
        / F.lit(4294967296.0)
    )
    k = F.lit(7)
    for i in range(len(_POIS_CDF) - 1, -1, -1):
        k = F.when(u < F.lit(_POIS_CDF[i]), i).otherwise(k)
    return (
        e.select("event_type", "value", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orig"),
            F.sum("k").cast("bigint").alias("n_resampled"),
            F.sum(F.when(F.col("k") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
            F.floor(F.sum(F.col("value") * F.col("k")) * 100 + F.lit(0.5))
            .cast("double")
            .alias("resampled_value_x100"),
        )
        .select(
            "event_type",
            "n_orig",
            "n_resampled",
            "n_dropped",
            (F.col("resampled_value_x100") / 100).alias("resampled_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# §2.20.6 robust outliers via median absolute deviation
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket,
         sum(value) AS v
  FROM events GROUP BY 1, 2),
med AS (
  SELECT event_type AS et, quantile_cont(v, 0.5) AS med
  FROM hourly GROUP BY 1),
mad AS (
  SELECT h.event_type AS et2, quantile_cont(abs(h.v - m.med), 0.5) AS mad
  FROM hourly h JOIN med m ON h.event_type = m.et GROUP BY 1)
SELECT h.event_type, h.bucket,
  floor(h.v * 1000000 + 0.5) / 1000000 AS v,
  floor((abs(h.v - m.med) / (1.4826 * d.mad)) * 1000 + 0.5) / 1000
    AS mad_z,
  CASE WHEN abs(h.v - m.med) > 3 * 1.4826 * d.mad THEN 1 ELSE 0 END
    AS is_outlier
FROM hourly h
JOIN med m ON h.event_type = m.et
JOIN mad d ON h.event_type = d.et2
ORDER BY h.event_type, h.bucket
"""


@query("q_ts_outlier_mad", oracle=_MAD_ORACLE, tags=("timeseries",))
def q_ts_outlier_mad(spark, sf_dir):
    """Robust outlier flagging on hourly sums: median + MAD (median
    absolute deviation, x1.4826 for normal consistency) instead of
    q_ts_anomaly's mean/stddev z-score — the estimator that does NOT
    move when the outliers themselves inflate the baseline (one 100x
    spike shifts mean and stddev enough to mask a 10x spike; it moves
    the median by at most one rank).  Two exact interpolated medians
    per type (Spark percentile == DuckDB quantile_cont), each a
    type-count-bounded aggregate broadcast back to the hourly rollup —
    hourly buckets per type are bounded by the time span, so at
    100 TB both median inputs are aggregate-sized, never raw-event-
    sized.  mad_z quantized at 3 decimals (a ratio of accumulated
    doubles — the q_ts_anomaly precision precedent)."""
    ev = Catalog(spark, sf_dir).events
    from skyhookdb_ceph_spark.queries._util import quantize

    hourly = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias(
            "bucket"
        ),
    ).agg(F.sum("value").alias("v"))
    med = hourly.groupBy(F.col("event_type").alias("et")).agg(
        F.expr("percentile(v, 0.5)").alias("med")
    )
    dev = hourly.join(F.broadcast(med), F.col("event_type") == F.col("et"))
    mad = dev.groupBy(F.col("event_type").alias("et2")).agg(
        F.expr("percentile(abs(v - med), 0.5)").alias("mad")
    )
    z = F.abs(F.col("v") - F.col("med")) / (1.4826 * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), F.col("event_type") == F.col("et2"))
        .select(
            "event_type",
            "bucket",
            quantize(F.col("v"), 6).alias("v"),
            quantize(z, 3).alias("mad_z"),
            F.when(
                F.abs(F.col("v") - F.col("med"))
                > 3 * 1.4826 * F.col("mad"),
                1,
            )
            .otherwise(0)
            .alias("is_outlier"),
        )
        .orderBy("event_type", "bucket")
    )


# ---------------------------------------------------------------------------
# §2.20.7 as-of join with staleness tolerance
# ---------------------------------------------------------------------------

_ASOF_TOL_ORACLE = """
SELECT e.event_id, e.ts,
  (SELECT max(c.ts) FROM events c
   WHERE c.user_id = e.user_id AND c.event_type = 'click'
     AND c.ts <= e.ts
     AND c.ts >= e.ts - INTERVAL 30 MINUTE) AS click_30m
FROM events e WHERE e.event_type = 'purchase'
"""


@query("q_join_asof_tolerance", oracle=_ASOF_TOL_ORACLE, tags=("join",))
def q_join_asof_tolerance(spark, sf_dir):
    """As-of join with a STALENESS TOLERANCE — q_join_asof's missing
    parameter: a purchase aligns to the user's most recent click only
    if that click is at most 30 minutes old; staler matches are
    rejected to NULL (pandas merge_asof's `tolerance`, the guard
    against joining a price quote from last week to today's trade).
    Implemented as the tolerance FILTER over the same union+window
    as-of recipe (operators/asof.py — one shuffle on user_id, no
    range explosion): the window still finds the latest preceding
    click, and the bound check nulls it after the fact — rejecting
    rows post-window is exact because anything older than the latest
    preceding click is older still.  Same bounded-state shape at
    100 TB as q_join_asof; the tolerance adds zero shuffles."""
    c = Catalog(spark, sf_dir)
    e = c.events
    from skyhookdb_ceph_spark.operators.asof import asof_join

    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts"), F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_col="click_ts",
        out_col="last_click_ts",
    )
    within = F.col("last_click_ts") >= F.col("ts") - F.expr(
        "INTERVAL 30 MINUTES"
    )
    return joined.select(
        "event_id",
        "ts",
        F.when(within, F.col("last_click_ts")).alias("click_30m"),
    )


# ---------------------------------------------------------------------------
# §2.20.8 one-sided CUSUM change detection via the prefix-min identity
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket,
         sum(value) AS v
  FROM events GROUP BY 1, 2),
mu AS (
  SELECT event_type AS et, avg(v) AS mu, stddev_samp(v) AS sigma
  FROM hourly GROUP BY 1),
p0 AS (
  -- DuckDB forbids nesting window calls (min(sum(...) OVER w) OVER w),
  -- so the prefix sum materializes one CTE level before the running min
  -- -- the same two stacked selects the Spark plan uses.
  SELECT h.event_type, h.bucket,
    sum(h.v - m.mu - 0.5 * m.sigma) OVER w AS pref,
    m.sigma
  FROM hourly h JOIN mu m ON h.event_type = m.et
  WINDOW w AS (PARTITION BY h.event_type ORDER BY h.bucket)),
p AS (
  SELECT event_type, bucket, pref, sigma,
    min(pref) OVER (PARTITION BY event_type ORDER BY bucket) AS pref_min
  FROM p0)
SELECT event_type, bucket,
  floor((pref - least(pref_min, 0)) * 1000 + 0.5) / 1000 AS cusum,
  CASE WHEN pref - least(pref_min, 0) > 5 * sigma THEN 1 ELSE 0 END
    AS is_shift
FROM p ORDER BY event_type, bucket
"""


@query(
    "q_ts_cusum",
    oracle=_CUSUM_ORACLE,
    tags=("timeseries", "scale-design"),
)
def q_ts_cusum(spark, sf_dir):
    """One-sided CUSUM change-point detection on hourly sums — the
    classic S_t = max(0, S_{t-1} + (v_t - mu - slack)) recursion,
    which looks inherently sequential but is exactly expressible as
    two window functions via the prefix-min identity:

        S_t = P_t - min(0, min_{i<=t} P_i),   P = prefix sum of
                                              (v - mu - 0.5 sigma)

    so the engine runs cumulative-sum + running-min inside ONE sorted
    window partition instead of a row-at-a-time recursion (no UDF, no
    iterative driver loop — the same make-the-recursion-algebraic
    move as q_ts_ewma's closed form).  A shift flags when S_t exceeds
    5 sigma.  Buckets per type are time-bounded, so the window input
    is aggregate-sized at any corpus size; mu/sigma are a
    type-bounded broadcast.  cusum quantized at 3 decimals (chained
    double accumulation, the z-score precedent)."""
    ev = Catalog(spark, sf_dir).events
    from pyspark.sql import Window as W

    from skyhookdb_ceph_spark.queries._util import quantize

    hourly = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias(
            "bucket"
        ),
    ).agg(F.sum("value").alias("v"))
    mu = hourly.groupBy(F.col("event_type").alias("et")).agg(
        F.avg("v").alias("mu"), F.stddev_samp("v").alias("sigma")
    )
    w = W.partitionBy("event_type").orderBy("bucket")
    wcum = w.rowsBetween(W.unboundedPreceding, 0)
    d = hourly.join(F.broadcast(mu), F.col("event_type") == F.col("et"))
    pref = F.sum(
        F.col("v") - F.col("mu") - 0.5 * F.col("sigma")
    ).over(wcum)
    p = d.select(
        "event_type",
        "bucket",
        "sigma",
        pref.alias("pref"),
    ).select(
        "event_type",
        "bucket",
        "sigma",
        "pref",
        F.min("pref").over(wcum).alias("pref_min"),
    )
    s = F.col("pref") - F.least(F.col("pref_min"), F.lit(0.0))
    return p.select(
        "event_type",
        "bucket",
        quantize(s, 3).alias("cusum"),
        F.when(s > 5 * F.col("sigma"), 1).otherwise(0).alias("is_shift"),
    ).orderBy("event_type", "bucket")


# ---------------------------------------------------------------------------
# §2.20.9 lag-k autocorrelation per series
# ---------------------------------------------------------------------------

_AUTOCORR_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket,
         sum(value) AS v
  FROM events GROUP BY 1, 2),
lagged AS (
  SELECT event_type, v,
    lag(v, 1) OVER (PARTITION BY event_type ORDER BY bucket) AS v1,
    lag(v, 24) OVER (PARTITION BY event_type ORDER BY bucket) AS v24
  FROM hourly)
SELECT event_type,
  CAST(count(v1) AS BIGINT) AS n_lag1,
  floor((corr(v, v1)) * 1000000 + 0.5) / 1000000 AS r_lag1,
  floor((corr(v, v24)) * 1000000 + 0.5) / 1000000 AS r_lag24
FROM lagged GROUP BY event_type ORDER BY event_type
"""


@query("q_ts_autocorr", oracle=_AUTOCORR_ORACLE, tags=("timeseries",))
def q_ts_autocorr(spark, sf_dir):
    """Lag-1 and lag-24 autocorrelation of the hourly series per type
    — the seasonality screen (a daily cycle shows as r_lag24 >>
    r_lag1) that decides whether q_ts_seasonal's decomposition is
    worth running at all.  Shape: hourly rollup (map-combined), lag
    via one sorted window per type over the AGGREGATE-sized series,
    then corr as a single-pass mergeable co-moment aggregate
    (q_agg_corr's machinery applied to the series against its own
    shift).  Nothing here ever re-touches raw events after the first
    rollup — at 100 TB the windowed data is bounded by types x
    time-buckets regardless of corpus size."""
    ev = Catalog(spark, sf_dir).events
    from pyspark.sql import Window as W

    from skyhookdb_ceph_spark.queries._util import quantize

    hourly = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias(
            "bucket"
        ),
    ).agg(F.sum("value").alias("v"))
    w = W.partitionBy("event_type").orderBy("bucket")
    lagged = hourly.select(
        "event_type",
        "v",
        F.lag("v", 1).over(w).alias("v1"),
        F.lag("v", 24).over(w).alias("v24"),
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count("v1").cast("bigint").alias("n_lag1"),
            quantize(F.corr("v", "v1"), 6).alias("r_lag1"),
            quantize(F.corr("v", "v24"), 6).alias("r_lag24"),
        )
        .orderBy("event_type")
    )
