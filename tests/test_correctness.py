"""Differential correctness: every registered query vs its DuckDB
oracle at sf0.001 — the same two-engine diff the driver runs at sf0.01
(tools/verify_local.py holds the canonicalization logic).

The reference validated pushdown the same way: one query, two
executions, diff the results [U: run-query.cc — --use-cls on/off].
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from verify_local import canon_df  # noqa: E402

from skyhookdb_ceph_spark.catalog import TABLES
from skyhookdb_ceph_spark.registry import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(load_all()))
def test_query_matches_oracle(spark, oracle_con, name):
    spec = load_all()[name]
    sdf = spec.fn(spark, SF).toPandas()
    odf = oracle_con.execute(spec.oracle).fetchdf()
    s_cols, s_kinds, s_rows = canon_df(sdf)
    o_cols, o_kinds, o_rows = canon_df(odf)
    assert s_cols == o_cols, f"columns differ: {s_cols} vs {o_cols}"
    assert s_kinds == o_kinds, "dtype kinds differ"
    assert len(s_rows) == len(o_rows), "row counts differ"
    assert s_rows == o_rows, "canonical values differ"
