"""Multi-query SHARED-SCAN execution (SURVEY.md §2.22).

The reference's client fans ONE query over the table's objects per
request [U: run-query.cc — one query_op per AIO dispatch]; a
training-data curation pipeline instead runs MANY quality screens over
the SAME corpus pass (language share, length bands, boilerplate
ratio, ...).  Run naively that is N full scans of a 100 TB table — the
scan, not the arithmetic, is the cost.

This operator folds N filter profiles into ONE Catalyst plan over ONE
scan: each filter becomes a set of conditional aggregates
(`sum(CASE WHEN pred THEN ...)`) inside a single global aggregate, so
whole-stage codegen evaluates every predicate per row in one pass and
the table is read exactly once (plan-asserted: one `Scan parquet` node,
tests/test_shared_scan.py).  The wide 1-row result is unpivoted
driver-side-cheaply (stack over one row) into the per-filter profile
table.  Measured N-pass vs 1-pass numbers: BASELINE.md §L.2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shared_filter_profile(
    df: DataFrame,
    filters: dict[str, Column],
    value_col: Column,
) -> DataFrame:
    """Profile every named filter over ONE scan of df.

    Returns one row per filter: (filter, n_rows, total_value) where
    total_value sums value_col over the filter's matches.  All
    predicates evaluate row-at-a-time inside one whole-stage-codegen
    aggregate — adding a filter adds two agg buffers, not a scan.
    """
    if not filters:
        raise ValueError("filters must be non-empty")
    aggs = []
    for name, pred in filters.items():
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0))
            .cast("bigint")
            .alias(f"__n_{name}")
        )
        aggs.append(
            F.sum(F.when(pred, value_col).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"__v_{name}")
        )
    wide = df.agg(*aggs)
    # unpivot the single wide row into (filter, n_rows, total_value);
    # stack over ONE row is driver-trivial at any corpus size
    cells = ", ".join(
        f"'{name}', __n_{name}, __v_{name}" for name in filters
    )
    return wide.selectExpr(
        f"stack({len(filters)}, {cells}) AS (filter, n_rows, total_value)"
    )
