"""Plan-shape assertions (SURVEY.md §4): the optimizer properties the
engine depends on — pushdown, broadcast choice, top-k fusion — are
verified from the formatted physical plan, mirroring how the reference
validated pushdown by diffing --use-cls on/off results
[U: run-query.cc — differential check].
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain prints)."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame) -> bool:
    s = explain_str(df)
    return "PushedFilters: [" in s and "PushedFilters: []" not in s


def scan_read_schema(df: DataFrame) -> str:
    """The ReadSchema fragment of the (first) scan — column pruning."""
    s = explain_str(df)
    for line in s.splitlines():
        if "ReadSchema:" in line:
            return line.split("ReadSchema:", 1)[1].strip()
    return ""


def joins_used(df: DataFrame) -> set[str]:
    s = explain_str(df, "simple")
    found = set()
    for kind in (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        if kind in s:
            found.add(kind)
    return found


def has_operator(df: DataFrame, name: str) -> bool:
    return name in explain_str(df, "simple")
