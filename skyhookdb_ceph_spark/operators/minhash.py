"""Banded MinHash LSH for near-duplicate detection (SURVEY.md §2.12).

100 TB design: the only joins are equi-joins —

1. band-signature self-join: shuffle on (band, signature); each bucket
   holds only docs sharing a minimum-hash shingle, so candidate pairs
   are ~linear in true near-dups, never O(n^2);
2. shingle-set lookup joins for exact Jaccard on the (small) candidate
   set: shuffle on doc_id.

Everything is Catalyst expressions (JVM codegen) — md5/array ops, no
Python.  Hash = md5 because it is byte-identical in DuckDB, keeping the
whole pipeline oracle-checkable (the driver red-flags oracle-less ops).

Determinism: band salt is the band index; no RNG anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from skyhookdb_ceph_spark.operators import ensure_parallelism

K_SHINGLE = 3  # words per shingle
N_BANDS = 8  # LSH bands (candidate = collision in ANY band)
# Min-hash ROWS per band: a band collides only when ALL r row-minima
# agree, so P(candidate | Jaccard s) = 1 - (1 - s^r)^b.  r=1 (the
# round-4..10 shape) thresholds that S-curve at ~(1/b)^(1/1) = 0.125 —
# at 100× fixture rows the sf10 smoke measured mid-similarity pairs
# (J≈0.3, correctly REJECTED by the exact verify) flooding the
# candidate join ~k² until the verify spill exceeded the disk
# (BASELINE.md §L.1).  r=4, b=8 moves the threshold to ~0.59:
# recall@J=0.8 = 1-(1-0.41)^8 = 98.5%, candidates@J=0.32 cut 12×.
N_ROWS = 4


def shingle_expr(text_col: str, k: int = K_SHINGLE) -> str:
    """Distinct k-word shingles of a text column (1-based, mirrors the
    DuckDB oracle's generate_series/list indexing)."""
    return (
        f"array_distinct(transform("
        f"sequence(1, greatest(size(split({text_col}, ' ')) - {k - 1}, 1)), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {k}))))"
    )


def shingle_sets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = K_SHINGLE,
) -> DataFrame:
    """(id, shingles) — distinct k-word shingle set per document.

    Built via posexplode + (k-1) leads over a doc-keyed window +
    collect_set, NOT the transform/slice lambda of shingle_expr: the
    higher-order form interprets one lambda (with an array slice
    allocation) per shingle, which dominated every MinHash query
    (measured: the fuzzy-dedup family dropped 2-4x at sf0.1).  The
    window's per-doc row count is bounded by document length, so the
    shuffle is safe at any corpus size.  Docs shorter than k words
    contribute their whole text as the single partial shingle —
    identical to shingle_expr and the DuckDB oracle (concat_ws
    rejoins split()'s empty tokens, so arbitrary whitespace
    round-trips exactly)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # Explicit NULL-text filter: explode(split(NULL)) silently drops
    # the row, whereas the DuckDB oracles produce a NULL signature that
    # can never equi-join — filtering here makes "NULL text yields no
    # candidates" true on both engines BY CONSTRUCTION, not by fixture
    # luck (ADVICE r4).
    docs = ensure_parallelism(docs).filter(F.col(text_col).isNotNull())
    words = docs.selectExpr(
        id_col, f"posexplode(split({text_col}, ' ')) AS (pos, w)"
    )
    wnd = Window.partitionBy(id_col).orderBy("pos")
    cols = [F.col("w").alias("w0")] + [
        F.lead("w", j).over(wnd).alias(f"w{j}") for j in range(1, k)
    ]
    full = (
        words.select(id_col, *cols)
        .filter(F.col(f"w{k - 1}").isNotNull())
        .select(
            id_col,
            F.concat_ws(" ", *[f"w{j}" for j in range(k)]).alias("s"),
        )
    )
    shorts = docs.selectExpr(id_col, f"{text_col} AS s").filter(
        f"size(split({text_col}, ' ')) < {k}"
    )
    return (
        full.unionByName(shorts)
        .groupBy(id_col)
        .agg(F.collect_set("s").alias("shingles"))
    )


def band_signatures(sh: DataFrame, n_bands: int = N_BANDS, id_col: str = "doc_id") -> DataFrame:
    """One BANDED min-hash signature per (doc, band): the
    concatenation of N_ROWS independent row-minima — two docs collide
    in a band only when every row agrees (the standard (b, r) LSH
    construction; see N_ROWS for the S-curve).

    Each shingle is md5-hashed ONCE; row (b, j)'s hash function is a
    rotation of that digest (the 8-hex window at offset b*N_ROWS+j of
    digest||digest) — b×r distinct hash families for the cost of one
    md5 per shingle (the dominant cost of the pipeline).  The min-hash
    collision argument only needs each row's function to rank shingles
    uniformly, which the rotated windows do (adjacent windows differ
    in their leading character, which decides almost every
    comparison)."""
    g = band_minima_wide(sh, n_bands, id_col)
    stack = ", ".join(f"{b}, b{b}" for b in range(n_bands))
    return g.selectExpr(
        id_col, f"stack({n_bands}, {stack}) AS (b, bsig)"
    )


def band_minima_wide(
    sh: DataFrame, n_bands: int = N_BANDS, id_col: str = "doc_id"
) -> DataFrame:
    """Wide form of band_signatures: one row per doc with columns
    b0..b{n_bands-1}.  Used stacked for the LSH bucket join and wide by
    the recall audit (the per-pair catch flag is an OR over the band
    columns — pure codegen, no extra shuffle)."""
    # Explode the shingle set once, hash each shingle once, and take
    # the per-row minimum as n_bands*N_ROWS grouped MIN aggregates —
    # the values equal the array_min(transform(...)) form exactly (min
    # commutes), but everything stays in whole-stage codegen instead
    # of interpreted lambdas per document.
    from pyspark.sql import functions as F

    ex = sh.selectExpr(id_col, "explode(shingles) AS s").selectExpr(
        id_col, "md5(s) AS h"
    )
    aggs = [
        F.concat(
            *[
                F.min(
                    F.expr(
                        f"substring(concat(h, h), {b * N_ROWS + j + 1}, 8)"
                    )
                )
                for j in range(N_ROWS)
            ]
        ).alias(f"b{b}")
        for b in range(n_bands)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def candidate_pairs(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct (a < b) pairs sharing any band signature — the LSH
    bucket equi-join."""
    a = sig.selectExpr(f"{id_col} AS da", "b", "bsig")
    c = sig.selectExpr(f"{id_col} AS db", "b AS b2", "bsig AS bsig2")
    return (
        a.join(c, (a.b == c.b2) & (a.bsig == c.bsig2) & (a.da < c.db))
        .select("da", "db")
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = N_BANDS,
) -> DataFrame:
    """Full fuzzy-dedup pipeline: shingle -> band LSH -> exact Jaccard
    on candidates -> filter >= threshold.  Returns (doc_a, doc_b, jac).

    The shingle-set DataFrame feeds THREE consumers (band signatures +
    both sides of the verify join); without persist() Spark re-derives
    the whole explode->window->collect_set subtree per consumer —
    measured 4x the shingling work in the physical plan.  persist()
    computes it once and serves the joins from cached partitions; at
    cluster scale this is the difference between one corpus pass and
    four."""
    from pyspark import StorageLevel

    sh = shingle_sets(docs, text_col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cand = candidate_pairs(band_signatures(sh, n_bands, id_col), id_col)
    x = sh.selectExpr(f"{id_col} AS da", "shingles AS sx")
    y = sh.selectExpr(f"{id_col} AS db", "shingles AS sy")
    # merge hints: the verify joins must NEVER broadcast the
    # shingle-set side — it is corpus-sized, and Catalyst's size
    # estimate for the derived subtree undershoots so badly that at
    # 100× fixture rows it picked BroadcastHashJoin and the driver
    # OOMed ("Not enough memory to build and broadcast", round 11,
    # BASELINE.md §L.1).  SortMergeJoin over shuffle_hash: the SHJ
    # hash build of the candidate side ALSO died at sf10 ("Can't
    # acquire ... bytes to build hash relation" — 32 concurrent
    # builds sharing one local heap), while SMJ sorts both sides and
    # SPILLS — the only strategy whose memory is bounded regardless
    # of candidate skew.
    return (
        cand.hint("merge")
        .join(x, "da")
        .hint("merge")
        .join(y, "db")
        .selectExpr(
            "da AS doc_a",
            "db AS doc_b",
            # cast(... as double): a bare 1.0 literal parses as DECIMAL in
            # Spark SQL, which would surface as Decimal objects in pandas;
            # floor-quantization instead of round() for engine parity
            "floor((cast(size(array_intersect(sx, sy)) AS double) "
            "/ size(array_distinct(concat(sx, sy)))) * 1000000 + 0.5) / 1000000 AS jac",
        )
        .filter(f"jac >= {threshold}")
    )


def recall_curve(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    audit_docs: int = 5000,
) -> DataFrame:
    """MEASURED recall of the production (b=8, r=4) banded LSH, per
    exact-Jaccard band — the audit every dedup stack owes its users
    after changing detector parameters (this repo changed r=1 -> r=4 in
    round 11; the 98.5%-recall@J=0.8 claim was analytic until now).

    Ground truth cannot be all-pairs at scale, so it is what production
    recall audits use: a PERMISSIVE reference detector — r=1 bands from
    an INDEPENDENT hash family (salted md5), S-curve threshold ~1/b =
    0.125 — over a deterministic, corpus-scaled doc sample (high bits
    of the Knuth multiplicative hash of the id, mod max(1,
    n//audit_docs) == 0; ~audit_docs docs at any corpus size; the
    whole fixture at fixture scale).  The hash — not the raw id — is
    what makes the sample hold on SPARSE or STRIDED id spaces
    (post-dedup survivors, all-odd ids): `doc_id % m == 0` silently
    empties or skews there.  The HIGH bits specifically: an odd
    multiplier leaves the product's low bits congruent to the id's,
    so a low-bit residue re-inherits the stride (Fibonacci-hashing
    rule, re-learned live in q_sample_token_budget).  Knuth's
    2654435761 is used instead of xxhash64 because the DuckDB oracle
    must compute the identical sample.  Exact Jaccard is computed on
    the reference candidates only; `caught` = the production bands
    collide (an OR over the 8 wide signature columns, no second LSH
    join).  Low-J bands measure the S-curve floor (recall ~ 0), the
    J>=0.8 bands the operating point (recall ~ 1).

    Columns: j_band (floor(jac*10)/10), truth_pairs, caught_pairs,
    recall.  100 TB: sample is O(audit_docs) regardless of corpus; the
    only joins are the reference band equi-join and doc-keyed feature
    lookups; never all-pairs.
    """
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs_audit"))
    sample = (
        docs.crossJoin(F.broadcast(n_docs))
        .filter(
            # ((id % 2^31-1) * knuth) % 2^32, then DROP the low 6 bits
            # before the modulus: knuth is odd, so the product's low
            # bits preserve id strides (h ≡ id·c mod 2^k) and an even
            # modulus over strided ids would still skew the sample —
            # the high bits are the well-mixed ones (Fibonacci
            # hashing).  Pre-mod keeps the product inside BIGINT for
            # any id; identical expression in DuckDB.
            f"CAST(floor(((({id_col} % 2147483647) * 2654435761) "
            "% 4294967296) / 64.0) AS BIGINT)"
            f" % greatest(1, CAST(floor(n_docs_audit / {audit_docs}.0) "
            "AS BIGINT)) = 0"
        )
        .drop("n_docs_audit")
    )
    sh = shingle_sets(sample, text_col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # reference detector: r=1, b=8 minima of an independent salted
    # family — candidates down to J ~ 0.05 by the 1-(1-J)^8 curve, so
    # the audit sees the S-curve's floor as well as its shoulder
    rex = sh.selectExpr(id_col, "explode(shingles) AS s").selectExpr(
        id_col, "md5(concat('r1|', s)) AS h"
    )
    rsig = rex.groupBy(id_col).agg(
        *[
            F.min(F.expr(f"substring(concat(h, h), {b * 4 + 1}, 8)")).alias(
                f"r{b}"
            )
            for b in range(N_BANDS)
        ]
    )
    stack = ", ".join(f"{b}, r{b}" for b in range(N_BANDS))
    rlong = rsig.selectExpr(
        id_col, f"stack({N_BANDS}, {stack}) AS (b, bsig)"
    )
    cand = candidate_pairs(rlong, id_col)
    # per-doc features for the verify side: shingle set (exact J) +
    # the 8 production band signatures (catch flag) — joined ONCE per
    # pair side; merge hints for the same reason as jaccard_pairs
    feat = sh.join(band_minima_wide(sh, N_BANDS, id_col), id_col)
    x = feat.selectExpr(
        f"{id_col} AS da",
        "shingles AS sx",
        *[f"b{b} AS ab{b}" for b in range(N_BANDS)],
    )
    y = feat.selectExpr(
        f"{id_col} AS db",
        "shingles AS sy",
        *[f"b{b} AS cb{b}" for b in range(N_BANDS)],
    )
    caught = " OR ".join(f"ab{b} = cb{b}" for b in range(N_BANDS))
    pairs = (
        cand.hint("merge")
        .join(x, "da")
        .hint("merge")
        .join(y, "db")
        .selectExpr(
            "floor((cast(size(array_intersect(sx, sy)) AS double) "
            "/ size(array_distinct(concat(sx, sy)))) * 1000000 + 0.5) "
            "/ 1000000 AS jac",
            f"CASE WHEN {caught} THEN 1 ELSE 0 END AS caught",
        )
    )
    return (
        pairs.groupBy(F.expr("floor(jac * 10) / 10").alias("j_band"))
        .agg(
            F.count(F.lit(1)).alias("truth_pairs"),
            F.sum("caught").alias("caught_pairs"),
        )
        .selectExpr(
            "j_band",
            "truth_pairs",
            "caught_pairs",
            # cast: a bare 1.0 literal parses as DECIMAL in Spark SQL
            # (object dtype in pandas) — double division like the oracle
            "floor(cast(caught_pairs AS double) / truth_pairs * 1000000 "
            "+ 0.5) / 1000000 AS recall",
        )
        .orderBy("j_band")
    )
