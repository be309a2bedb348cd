#!/usr/bin/env python
"""Local mimic of the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle over
the same parquet, compares row count + column names + dtype kinds +
order-insensitive canonical values.  Usage:

    python tools/verify_local.py [sf_dir] [query_id ...]

Defaults to /root/testdata/sf0.01 (the driver's correctness SF) and all
queries.  Exit code 1 if anything fails.
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from skyhookdb_ceph_spark.catalog import TABLES
from skyhookdb_ceph_spark.registry import load_all
from skyhookdb_ceph_spark.session import get_spark


def canon_val(v):
    """Canonical string for one value (engine-neutral)."""
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return repr(v)
    if isinstance(v, (np.floating,)):
        return canon_val(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        if pd.isna(v):
            return "<NULL>"
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(canon_val(x) for x in v) + "]"
    if v is pd.NaT:
        return "<NULL>"
    try:
        if pd.isna(v):
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_df(df: pd.DataFrame) -> tuple[list[str], list[str], list[tuple]]:
    cols = sorted(df.columns)
    kinds = [df[c].dtype.kind for c in cols]
    rows = sorted(
        tuple(canon_val(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )
    return cols, kinds, rows


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]
    only = set(args)

    specs = load_all()
    if only:
        specs = {k: v for k, v in specs.items() if k in only}

    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, spec in sorted(specs.items()):
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        if spec.oracle is None:
            print(f"ok    {name}: rows-only, {len(sdf)} rows")
            continue
        try:
            odf = con.execute(spec.oracle).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        s_cols, s_kinds, s_rows = canon_df(sdf)
        o_cols, o_kinds, o_rows = canon_df(odf)
        problems = []
        if s_cols != o_cols:
            problems.append(f"cols spark={s_cols} oracle={o_cols}")
        elif s_kinds != o_kinds:
            problems.append(
                "dtype kinds differ: "
                + ", ".join(
                    f"{c}: {a}!={b}"
                    for c, a, b in zip(s_cols, s_kinds, o_kinds)
                    if a != b
                )
            )
        if len(s_rows) != len(o_rows):
            problems.append(f"rowcount spark={len(s_rows)} oracle={len(o_rows)}")
        elif not problems and s_rows != o_rows:
            diff_at = next(
                (i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b), -1
            )
            problems.append(
                f"values differ at sorted row {diff_at}:\n"
                f"        spark : {s_rows[diff_at] if diff_at >= 0 else '?'}\n"
                f"        oracle: {o_rows[diff_at] if diff_at >= 0 else '?'}"
            )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS  {name}: {len(s_rows)} rows")

    print(f"\n{len(specs) - len(failures)}/{len(specs)} passed")
    if failures:
        print("failed:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
