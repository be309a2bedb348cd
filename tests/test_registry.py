"""Registry contract tests: the driver-facing invariants."""

from __future__ import annotations

import __spark_entry__ as entry_mod
from skyhookdb_ceph_spark.registry import load_all


def test_every_query_has_an_oracle():
    """The driver has no rows-only fallback (round-1 lesson): every
    registered query must carry DuckDB oracle SQL."""
    missing = [n for n, s in load_all().items() if s.oracle is None]
    assert missing == []


def test_driver_contract_shapes():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert entry_mod.FLAGSHIP in qs
    assert len(qs) >= 64  # SURVEY.md §2 inventory size


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "l_returnflag" in df.columns
