"""Plan-shape assertions (SURVEY.md §4): the optimizer properties the
engine depends on — pushdown, broadcast choice, top-k fusion — are
verified from the formatted physical plan, mirroring how the reference
validated pushdown by diffing --use-cls on/off results
[U: run-query.cc — differential check].
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Sort-order arguments in an optimized-plan windowspecdefinition print
# as "<expr> ASC NULLS FIRST" / "<expr> DESC NULLS LAST".
_SORT_ORDER_SUFFIX = re.compile(r"\b(ASC|DESC) NULLS (FIRST|LAST)$")


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


def count_unpartitioned_windows(df: DataFrame) -> int:
    """Number of window specs with an EMPTY partition clause in the
    optimized logical plan — each one is a single-task global sort at
    execution (Spark's "No Partition Defined for Window operation!"
    WARN, promoted here to a countable plan property so a NEW global
    window is visible instead of buried in a log tail).

    Parses `windowspecdefinition(partition..., order..., frame)` with
    balanced-paren scanning: arguments before the frame that carry no
    ASC/DESC sort marker are partition expressions; zero of them means
    the window is global.  Plan-string based, so it costs nothing on a
    DataFrame whose plan is already analyzed (no job is run)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001
    n = 0
    key = "windowspecdefinition("
    i = 0
    while True:
        i = plan.find(key, i)
        if i < 0:
            break
        j = i + len(key)
        depth = 1
        args, buf = [], []
        while j < len(plan) and depth > 0:
            ch = plan[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            if ch == "," and depth == 1:
                args.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
            j += 1
        if buf:
            args.append("".join(buf))
        body = [
            a
            for a in (s.strip() for s in args)
            if not a.startswith("specifiedwindowframe")
        ]
        # Match the trailing sort-order grammar, not a bare " ASC"/
        # " DESC" substring, so a partition expression whose printed
        # form merely CONTAINS those tokens (a literal 'X ASC', an
        # alias named foo_DESC) is not miscounted as a sort key.
        parts = [a for a in body if not _SORT_ORDER_SUFFIX.search(a)]
        if not parts:
            n += 1
        i = j
    return n
