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
            s.filter(F.col("sec") % width >= width - _FRAME_SEC)
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
