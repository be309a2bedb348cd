"""Skew mitigation via key salting (SURVEY.md §4 scale notes).

A groupBy/join on a skewed key funnels the hot key's rows into one
task.  AQE's skew-join splitting covers sort-merge joins; for
aggregations the classic fix is salting: append a random-ish salt to
the key, aggregate partially per (key, salt), then re-aggregate per
key.  Both phases are map-side-combinable, so the hot key's work is
spread over `n_salts` tasks and the second shuffle carries only
n_salts rows per key.

The salt here is deterministic (hash of a stable row id, mod n_salts)
so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_src_col: Column,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side's key with a
    deterministic hash of `salt_src_col` (mod n_salts) and replicate
    the small side once per salt value, joining on (key, salt).

    A hot key's rows — all hashed to ONE shuffle partition by a plain
    equi-join — are spread across n_salts partitions; the price is an
    n_salts-fold replication of the small side, which is the right
    trade exactly when the small side is too big to broadcast but far
    smaller than the hot key's row count.  (AQE's skew-join split
    covers sort-merge joins after the fact; salting fixes the shuffle
    itself and also applies when AQE is off or the join is
    hash-partitioned for a downstream stage.)  The salt is a hash of a
    stable row id, never RNG, so the result is reproducible and equal
    to the unsalted join for any salt assignment."""
    salted_big = big.withColumn(
        "__salt", F.pmod(F.hash(salt_src_col), F.lit(n_salts))
    )
    replicated = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    joined = salted_big.join(
        replicated,
        (salted_big[big_key] == replicated[small_key])
        & (salted_big["__salt"] == replicated["__salt"]),
    )
    return joined.drop("__salt")


def salted_sum_count(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    salt_col: Column,
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(group_cols).agg(sum(value), count(*)) computed via a
    two-phase salted aggregation; algebraically identical to the direct
    aggregate (sum of sums, sum of counts) for any salt assignment."""
    salted = df.withColumn("__salt", F.pmod(F.hash(salt_col), F.lit(n_salts)))
    partial = salted.groupBy(*group_cols, "__salt").agg(
        F.sum(value_col).alias("__psum"),
        F.count(F.lit(1)).alias("__pcnt"),
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__psum").alias(f"sum_{value_col}"),
        F.sum("__pcnt").alias("cnt"),
    )


# One shuffle-partition's fair share of the rows: a key holding more
# than this funnels > 1 task's worth of work into one reduce task, so
# the two-phase salted plan wins despite its second (tiny) shuffle.
SKEW_SHARE_THRESHOLD = 1.0 / 32


def max_key_share(df: DataFrame, key: str) -> float:
    """1-row skew probe: the hot key's share of all rows.

    A keyed count is map-side combined, so the probe shuffles at most
    (distinct keys × partitions) partial rows and reduces to ONE row —
    the same measured-statistics move as q_join_stats_driven, applied
    to aggregation planning: static file stats can't see post-filter
    key skew, a 1-row probe can.  Returns 0.0 on an empty frame."""
    row = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg((F.max("__n") / F.sum("__n")).alias("share"))
        .first()
    )
    share = row["share"] if row is not None else None
    return float(share) if share is not None else 0.0


def adaptive_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_src_col: Column,
    n_salts: int = 8,
    threshold: float = SKEW_SHARE_THRESHOLD,
) -> DataFrame:
    """Equi-join whose PHYSICAL strategy is chosen from a measured
    1-row skew probe (the join-side twin of adaptive_sum_by_key's
    aggregation branch): if the big side's hottest key holds more than
    one shuffle-partition's fair share of rows, take salted_join —
    spreading the hot key over n_salts tasks at the cost of
    replicating the small side; otherwise the plain equi-join, which
    is strictly cheaper when no key dominates.  Both branches return
    identical rows for any salt assignment, so callers (and oracles)
    never need to know which one ran.  At 100 TB the probe is one
    map-combined pass over the key column; a mis-planned hot-key join
    is a straggler task holding the whole stage."""
    if max_key_share(big.select(big_key), big_key) > threshold:
        return salted_join(
            big, small, big_key, small_key, salt_src_col, n_salts
        )
    return big.join(small, big[big_key] == small[small_key])
