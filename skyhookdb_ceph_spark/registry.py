"""Query registry: the single source of truth binding SURVEY.md §2
QueryIDs to (a) a Spark implementation and (b) the equivalent DuckDB
oracle SQL.

The driver contract (__spark_entry__.py) requires queries() and
oracle_sql() to stay in lockstep — same keys, same output column names.
Defining both in one decorator call makes drift structurally impossible.

Mirrors the reference's own differential-testing idea: the same query
runs through two independent engines and results are diffed
[U: src/progly/run-query.cc — --use-cls on/off differential check].
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None is a RED row (see query() warning)
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a (spark, sf_dir) -> DataFrame callable under a QueryID.

    ``oracle`` is ANSI SQL DuckDB runs over the same parquet views.
    WARNING: the driver has NO rows-only fallback — oracle=None comes
    back as a red ``err: no_oracle`` row in CORRECTNESS (verified round
    1).  Every registered query must carry an oracle; make non-SQL ops
    oracle-comparable (deterministic seeds, banded verdict columns,
    batch twins) instead of omitting it.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate QueryID {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags))
        return fn

    return deco


_LOADED = False


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: populates REGISTRY)."""
    global _LOADED
    if not _LOADED:
        from skyhookdb_ceph_spark.queries import (  # noqa: F401
            aggregates,
            composite,
            filters,
            functions_q,
            joins,
            llm,
            scans,
            setops,
            sorts,
            streaming_q,
            subqueries,
            udfs,
            windows,
        )

        _LOADED = True
    return REGISTRY
