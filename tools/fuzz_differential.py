#!/usr/bin/env python
"""Randomized DIFFERENTIAL query fuzzer: Spark vs DuckDB.

The fixed registry queries are regression insurance; they can no
longer FIND unknown bugs.  This generator samples a SPACE of queries —
predicate trees over every fixture column type (with NULL boundaries
injected via nullif-derived columns), group-by/aggregate combos, join
shapes (inner/left/semi/anti), window frames, set operations
(UNION/EXCEPT/INTERSECT, ALL and DISTINCT), and nested two-level
aggregation (re-aggregating per-group results) — and renders each
case TWICE from one spec: as a PySpark DataFrame program and as
ANSI-ish DuckDB SQL.  Results are diffed with the same canon machinery
the correctness gate uses (tools/verify_local.canon_df).  This is the
reference's own two-engine differential idea [U: src/progly/
run-query.cc — the --use-cls on/off cross-check] generalized from
fixed points to a sampled space.

Determinism rules (the oracle-parity house rules, §BASELINE):
- every aggregate alias identical on both sides;
- double sums/avgs quantized via floor(x*10^d + 0.5)/10^d;
- nullable aggregates coalesced to typed defaults on BOTH sides (so
  all-NULL groups can't flip pandas dtype kinds between engines);
- ORDER BY ... LIMIT only over a total order (unique key appended);
- no engine-specific functions — the rendered subset is the
  intersection dialect (||, substr, nullif, coalesce, year/month/day,
  LIKE, BETWEEN, IN, IS [NOT] NULL, IS NOT DISTINCT FROM).

Usage:
    python tools/fuzz_differential.py [--n 500] [--seed0 0]
        [--sf /root/testdata/sf0.001] [--stop-on-fail]

Exit 1 if any case diverges; failing cases are shrunk (query-level
reductions) and dumped as JSON repros under tools/fuzz_failures/.
"""

from __future__ import annotations

import json
import random
import sys
from dataclasses import dataclass, field, replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# column catalog (types + literal pools measured from the fixtures)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Col:
    name: str
    typ: str  # i / f / s / t
    lits: tuple = ()
    like: tuple = ()  # LIKE patterns (string cols)
    sumq: int = 4  # quantize digits for sums/avgs of this column


@dataclass(frozen=True)
class Table:
    name: str
    cols: tuple[Col, ...]
    unique: tuple[str, ...]  # total-order tiebreak key
    lowcard: tuple[str, ...]  # group/partition candidates

    def col(self, name: str) -> Col:
        return next(c for c in self.cols if c.name == name)

    def by_typ(self, typ: str) -> list[Col]:
        return [c for c in self.cols if c.typ == typ]


CATALOG: dict[str, Table] = {
    t.name: t
    for t in [
        Table(
            "lineitem",
            (
                Col("l_orderkey", "i", (1, 7, 500, 1200, 6000)),
                Col("l_partkey", "i", (1, 50, 900)),
                Col("l_suppkey", "i", (1, 5, 60)),
                Col("l_linenumber", "i", (1, 2, 4, 7)),
                Col("l_quantity", "f", (1.0, 10.0, 25.0, 49.0)),
                Col(
                    "l_extendedprice",
                    "f",
                    (1000.0, 17500.5, 60000.0),
                    sumq=2,
                ),
                Col("l_discount", "f", (0.0, 0.04, 0.08), sumq=6),
                Col("l_tax", "f", (0.0, 0.03, 0.07), sumq=6),
                Col("l_returnflag", "s", ("A", "N", "R"), ("A%", "_")),
                Col("l_linestatus", "s", ("O", "F"), ("O%",)),
                Col(
                    "l_shipdate",
                    "t",
                    (
                        "1995-06-01 00:00:00",
                        "1997-01-01 00:00:00",
                        "1999-12-31 23:59:59",
                    ),
                ),
            ),
            # NO unique key: the synthetic fixture duplicates
            # (l_orderkey, l_linenumber) pairs (measured — 1161 dups at
            # sf0.001), so lineitem is excluded from order-sensitive
            # shapes (ROWS-frame windows, ORDER+LIMIT): a non-total
            # order makes row_number/cumsum legitimately
            # engine-divergent, a harness false alarm, not a bug
            # (found by seed 35 of this fuzzer's first run).
            (),
            ("l_returnflag", "l_linestatus"),
        ),
        Table(
            "orders",
            (
                Col("o_orderkey", "i", (1, 44, 1500, 5999)),
                Col("o_custkey", "i", (1, 70, 149, 1400)),
                Col("o_orderstatus", "s", ("O", "F", "P"), ("F%",)),
                Col("o_totalprice", "f", (5000.0, 150000.25), sumq=2),
                Col(
                    "o_orderdate",
                    "t",
                    ("1995-07-04 00:00:00", "1998-02-11 00:00:00"),
                ),
                Col(
                    "o_orderpriority",
                    "s",
                    ("1-URGENT", "3-MEDIUM", "5-LOW"),
                    ("1-%", "%GH%"),
                ),
            ),
            ("o_orderkey",),
            ("o_orderstatus", "o_orderpriority"),
        ),
        Table(
            "customer",
            (
                Col("c_custkey", "i", (1, 77, 800)),
                Col("c_name", "s", (), ("Customer#%", "%1%")),
                Col("c_nationkey", "i", (0, 7, 24)),
                Col("c_acctbal", "f", (-500.0, 0.0, 4500.75), sumq=2),
                Col(
                    "c_mktsegment",
                    "s",
                    ("BUILDING", "AUTOMOBILE", "FURNITURE"),
                    ("B%", "%URE"),
                ),
            ),
            ("c_custkey",),
            ("c_mktsegment", "c_nationkey"),
        ),
        Table(
            "part",
            (
                Col("p_partkey", "i", (1, 33, 1900)),
                Col("p_name", "s", (), ("%li%", "a%")),
                Col("p_brand", "s", ("Brand#9", "Brand#13"), ("Brand#1%",)),
                Col("p_size", "i", (1, 15, 49)),
                Col("p_retailprice", "f", (905.0, 950.5), sumq=2),
            ),
            ("p_partkey",),
            ("p_brand", "p_size"),
        ),
        Table(
            "events",
            (
                Col("event_id", "i", (5, 4000, 9000)),
                Col(
                    "ts",
                    "t",
                    ("2024-01-05 00:00:00", "2024-01-20 12:00:00"),
                ),
                Col("user_id", "i", (0, 25, 90, 148)),
                Col(
                    "event_type",
                    "s",
                    ("click", "view", "purchase", "error"),
                    ("c%", "%e%"),
                ),
                Col("value", "f", (0.5, 120.0, 480.0), sumq=4),
            ),
            ("event_id",),
            ("event_type", "user_id"),
        ),
        Table(
            "documents",
            (
                Col("doc_id", "i", (1, 100, 400)),
                Col("text", "s", (), ("%the%", "%a%")),
                Col("lang", "s", ("en", "de", "zh", "fr"), ("e%",)),
                Col("source", "s", ("src0", "src7", "src15"), ("src1%",)),
                Col("n_chars", "i", (60, 150, 300, 500)),
            ),
            ("doc_id",),
            ("lang", "source"),
        ),
    ]
}

JOINS = [
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
]

_SPARK_T = {"i": "bigint", "f": "double", "s": "string", "t": "timestamp"}
_DUCK_T = {"i": "BIGINT", "f": "DOUBLE", "s": "VARCHAR", "t": "TIMESTAMP"}


# ---------------------------------------------------------------------------
# expression pairs: (spark Column, duckdb SQL string, type)
# ---------------------------------------------------------------------------


@dataclass
class Ex:
    sp: Column
    sql: str
    typ: str


def lit_ex(val, typ: str) -> Ex:
    if val is None:
        return Ex(
            F.lit(None).cast(_SPARK_T[typ]),
            f"CAST(NULL AS {_DUCK_T[typ]})",
            typ,
        )
    if typ == "s":
        return Ex(F.lit(val), "'" + str(val).replace("'", "''") + "'", "s")
    if typ == "t":
        return Ex(F.lit(val).cast("timestamp"), f"TIMESTAMP '{val}'", "t")
    if typ == "f":
        return Ex(F.lit(float(val)), repr(float(val)), "f")
    return Ex(F.lit(int(val)), str(int(val)), "i")


def col_ex(c: Col) -> Ex:
    return Ex(F.col(c.name), c.name, c.typ)


def _q(e: Ex, digits: int) -> Ex:
    scale = 10**digits
    return Ex(
        F.floor(e.sp * scale + F.lit(0.5)) / scale,
        f"floor(({e.sql}) * {scale} + 0.5) / {scale}",
        "f",
    )


# ---------------------------------------------------------------------------
# generators
# ---------------------------------------------------------------------------


def gen_scalar(rng: random.Random, t: Table, depth: int = 2) -> Ex:
    """A typed scalar expression over t's columns (NULL-injecting
    forms included)."""
    base_cols = list(t.cols)
    c = rng.choice(base_cols)
    e = col_ex(c)
    if depth <= 0:
        return e
    kind = rng.random()
    if kind < 0.22 and c.typ in "if" and c.lits:
        # nullif: the NULL-boundary injector
        v = lit_ex(rng.choice(c.lits), c.typ)
        return Ex(
            F.when(e.sp == v.sp, F.lit(None)).otherwise(e.sp),
            f"nullif({e.sql}, {v.sql})",
            c.typ,
        )
    if kind < 0.38 and c.typ in "if" and c.lits:
        v = lit_ex(rng.choice(c.lits), c.typ)
        op = rng.choice(["+", "-", "*"])
        if op == "*":
            v = lit_ex(rng.choice([2, 3]), "i" if c.typ == "i" else "f")
        sp = {"+": e.sp + v.sp, "-": e.sp - v.sp, "*": e.sp * v.sp}[op]
        return Ex(sp, f"({e.sql} {op} {v.sql})", c.typ)
    if kind < 0.5 and c.typ == "s":
        p = rng.randint(1, 3)
        n = rng.randint(1, 4)
        return Ex(
            F.substring(e.sp, p, n), f"substr({e.sql}, {p}, {n})", "s"
        )
    if kind < 0.58 and c.typ == "s":
        fn = rng.choice(["upper", "lower", "length"])
        if fn == "length":
            return Ex(
                F.length(e.sp).cast("bigint"),
                f"CAST(length({e.sql}) AS BIGINT)",
                "i",
            )
        return Ex(getattr(F, fn)(e.sp), f"{fn}({e.sql})", "s")
    if kind < 0.68 and c.typ == "t":
        fn = rng.choice(["year", "month", "day"])
        return Ex(
            getattr(F, fn)(e.sp).cast("bigint"),
            f"CAST({fn}({e.sql}) AS BIGINT)",
            "i",
        )
    if kind < 0.76 and c.typ in "if":
        return Ex(F.abs(e.sp), f"abs({e.sql})", c.typ)
    if kind < 0.86:
        # CASE WHEN pred THEN col END — NULL for non-matching rows
        pred = gen_pred(rng, t, depth - 1)
        return Ex(
            F.when(pred.sp, e.sp),
            f"CASE WHEN {pred.sql} THEN {e.sql} END",
            c.typ,
        )
    if c.typ in "if" and c.lits:
        # coalesce over a nullif — NULL created then healed
        v = lit_ex(rng.choice(c.lits), c.typ)
        d = lit_ex(rng.choice(c.lits), c.typ)
        return Ex(
            F.coalesce(
                F.when(e.sp == v.sp, F.lit(None)).otherwise(e.sp), d.sp
            ),
            f"coalesce(nullif({e.sql}, {v.sql}), {d.sql})",
            c.typ,
        )
    return e


def gen_pred(rng: random.Random, t: Table, depth: int = 2) -> Ex:
    """A boolean predicate tree over t."""
    if depth > 0 and rng.random() < 0.45:
        a = gen_pred(rng, t, depth - 1)
        b = gen_pred(rng, t, depth - 1)
        if rng.random() < 0.5:
            return Ex(a.sp & b.sp, f"({a.sql} AND {b.sql})", "b")
        return Ex(a.sp | b.sp, f"({a.sql} OR {b.sql})", "b")
    if depth > 0 and rng.random() < 0.12:
        a = gen_pred(rng, t, depth - 1)
        return Ex(~a.sp, f"(NOT {a.sql})", "b")
    e = gen_scalar(rng, t, depth=1)
    r = rng.random()
    if r < 0.12:
        neg = rng.random() < 0.5
        return Ex(
            e.sp.isNull() if not neg else e.sp.isNotNull(),
            f"({e.sql} IS {'NOT ' if neg else ''}NULL)",
            "b",
        )
    # literal pool of the expression's type, from any column of t
    pool = [c for c in t.cols if c.typ == e.typ and c.lits]
    if not pool:
        return Ex(e.sp.isNotNull(), f"({e.sql} IS NOT NULL)", "b")
    src = rng.choice(pool)
    if r < 0.24 and e.typ in "ifts":
        lo, hi = sorted(rng.sample(list(src.lits), 2)) if len(
            src.lits
        ) >= 2 else (src.lits[0], src.lits[0])
        lo_e, hi_e = lit_ex(lo, e.typ), lit_ex(hi, e.typ)
        return Ex(
            e.sp.between(lo_e.sp, hi_e.sp),
            f"({e.sql} BETWEEN {lo_e.sql} AND {hi_e.sql})",
            "b",
        )
    if r < 0.36:
        vals = rng.sample(list(src.lits), min(len(src.lits), rng.randint(1, 3)))
        exs = [lit_ex(v, e.typ) for v in vals]
        return Ex(
            e.sp.isin(*[x.sp for x in exs]),
            f"({e.sql} IN ({', '.join(x.sql for x in exs)}))",
            "b",
        )
    if r < 0.44 and e.typ == "s" and src.like:
        pat = rng.choice(src.like)
        return Ex(e.sp.like(pat), f"({e.sql} LIKE '{pat}')", "b")
    if r < 0.52:
        v = lit_ex(rng.choice(src.lits), e.typ)
        return Ex(
            e.sp.eqNullSafe(v.sp),
            f"({e.sql} IS NOT DISTINCT FROM {v.sql})",
            "b",
        )
    op = rng.choice(["=", "<>", "<", "<=", ">", ">="])
    v = lit_ex(rng.choice(src.lits), e.typ)
    sp = {
        "=": e.sp == v.sp,
        "<>": e.sp != v.sp,
        "<": e.sp < v.sp,
        "<=": e.sp <= v.sp,
        ">": e.sp > v.sp,
        ">=": e.sp >= v.sp,
    }[op]
    return Ex(sp, f"({e.sql} {op} {v.sql})", "b")


@dataclass
class AggEx:
    alias: str
    sp: Column
    sql: str
    numeric_int: bool = False  # count/sum-of-int: safe HAVING target
    otyp: str = "f"  # output type (i/f/s/t) — outer aggs need it for
    # typed NULL-coalescing when re-aggregating (agg2 shapes)


def gen_agg(rng: random.Random, t: Table, alias: str) -> AggEx:
    """One aggregate with typed-default coalescing on BOTH sides (an
    all-NULL group must not flip pandas dtype kinds between engines)."""
    kind = rng.choice(
        ["count_star", "count", "count_distinct", "sum", "min", "max", "avg"]
    )
    if kind == "count_star":
        return AggEx(
            alias,
            F.count(F.lit(1)).cast("bigint").alias(alias),
            f"CAST(count(*) AS BIGINT) AS {alias}",
            numeric_int=True,
            otyp="i",
        )
    arg = gen_scalar(rng, t, depth=rng.randint(0, 2))
    if kind == "count":
        return AggEx(
            alias,
            F.count(arg.sp).cast("bigint").alias(alias),
            f"CAST(count({arg.sql}) AS BIGINT) AS {alias}",
            numeric_int=True,
            otyp="i",
        )
    if kind == "count_distinct":
        return AggEx(
            alias,
            F.count_distinct(arg.sp).cast("bigint").alias(alias),
            f"CAST(count(DISTINCT {arg.sql}) AS BIGINT) AS {alias}",
            numeric_int=True,
            otyp="i",
        )
    if kind in ("min", "max"):
        dflt = {
            "i": lit_ex(0, "i"),
            "f": lit_ex(0.0, "f"),
            "s": lit_ex("", "s"),
            "t": lit_ex("1970-01-01 00:00:00", "t"),
        }[arg.typ]
        spf = F.min(arg.sp) if kind == "min" else F.max(arg.sp)
        return AggEx(
            alias,
            F.coalesce(spf, dflt.sp).alias(alias),
            f"coalesce({kind}({arg.sql}), {dflt.sql}) AS {alias}",
            otyp=arg.typ,
        )
    if arg.typ == "s" or arg.typ == "t":
        # sum/avg need numerics; fall back to count
        return AggEx(
            alias,
            F.count(arg.sp).cast("bigint").alias(alias),
            f"CAST(count({arg.sql}) AS BIGINT) AS {alias}",
            numeric_int=True,
            otyp="i",
        )
    digits = 4
    # price-magnitude sums quantize coarser (summation-order drift)
    base_cols = {c.name for c in t.cols if c.sumq == 2}
    if any(n in arg.sql for n in base_cols):
        digits = 2
    if kind == "sum" and arg.typ == "i":
        return AggEx(
            alias,
            F.coalesce(F.sum(arg.sp), F.lit(0)).cast("bigint").alias(alias),
            f"CAST(coalesce(sum({arg.sql}), 0) AS BIGINT) AS {alias}",
            numeric_int=True,
            otyp="i",
        )
    fn = "sum" if kind == "sum" else "avg"
    spf = F.sum(arg.sp) if kind == "sum" else F.avg(arg.sp)
    scale = 10**digits
    return AggEx(
        alias,
        F.coalesce(
            F.floor(spf * scale + F.lit(0.5)) / scale, F.lit(0.0)
        ).alias(alias),
        f"coalesce(floor(({fn}({arg.sql})) * {scale} + 0.5) / {scale}, 0.0)"
        f" AS {alias}",
    )


# ---------------------------------------------------------------------------
# query specs (shrinkable) + renderers
# ---------------------------------------------------------------------------


@dataclass
class FilterSpec:
    table: str
    derived: list[tuple[str, Ex]]
    pred: Ex | None
    out: list[str]  # base column names
    order_limit: tuple[list[str], int] | None


@dataclass
class AggSpec:
    table: str
    pred: Ex | None
    keys: list[tuple[str, Ex]]  # (alias, expr)
    aggs: list[AggEx]
    having: tuple[str, str, float] | None  # (alias, op, lit)


@dataclass
class JoinSpec:
    left: str
    right: str
    lkey: str
    rkey: str
    how: str  # inner / left / semi / anti
    lpred: Ex | None
    rpred: Ex | None
    group: str | None  # group col (left side)
    aggs: list[AggEx]


@dataclass
class WindowSpec:
    table: str
    pred: Ex | None
    part: str
    order: list[tuple[str, bool]]  # (col, asc) — unique key appended
    funcs: list[tuple[str, str, str | None, int | None]]
    # (alias, kind, argcol, frame_k)


@dataclass
class SetOpSpec:
    table: str
    out: list[str]  # shared projection (same table both legs)
    op: str  # union_all/union/except_all/except/intersect_all/intersect
    lpred: Ex | None
    rpred: Ex | None


@dataclass
class Agg2Spec:
    table: str
    pred: Ex | None
    key: str  # level-1 group col (lowcard)
    inner: list[AggEx]
    outer: list[tuple[str, str, str]]  # (alias, fn, inner alias or "*")


@dataclass
class Case:
    seed: int
    kind: str
    spec: object


# outer re-aggregation functions by inner output type: min/max work on
# any orderable type; sum/avg only where re-summation is exact (ints)
# or already quantized per-group would NOT be order-stable (so doubles
# get min/max/count only — summing quantized doubles across groups in
# engine-dependent order can drift in the last ulp)
_OUTER_FNS = {
    "i": ("min", "max", "sum", "avg", "count"),
    "f": ("min", "max", "count"),
    "s": ("min", "max", "count"),
    "t": ("min", "max", "count"),
}


def gen_case(seed: int) -> Case:
    rng = random.Random(seed)
    kind = rng.choice(
        ["filter", "agg", "agg", "join", "window", "setop", "agg2"]
    )
    if kind == "filter":
        t = CATALOG[rng.choice(list(CATALOG))]
        derived = [
            (f"d{i}", gen_scalar(rng, t, depth=2))
            for i in range(rng.randint(0, 2))
        ]
        pred = gen_pred(rng, t, depth=2) if rng.random() < 0.9 else None
        out = rng.sample(
            [c.name for c in t.cols], rng.randint(1, min(4, len(t.cols)))
        )
        order_limit = None
        if rng.random() < 0.35 and t.unique:
            keys = rng.sample(out, min(len(out), rng.randint(1, 2)))
            for u in t.unique:
                if u not in keys:
                    keys.append(u)
                if u not in out:
                    out.append(u)
            order_limit = (keys, rng.choice([5, 20, 100]))
        spec = FilterSpec(t.name, derived, pred, out, order_limit)
    elif kind == "agg":
        t = CATALOG[rng.choice(list(CATALOG))]
        pred = gen_pred(rng, t, depth=2) if rng.random() < 0.7 else None
        keys = []
        for i in range(rng.randint(0, 2)):
            if rng.random() < 0.6:
                c = t.col(rng.choice(t.lowcard))
                keys.append((f"k{i}", col_ex(c)))
            else:
                keys.append((f"k{i}", gen_scalar(rng, t, depth=1)))
        aggs = [
            gen_agg(rng, t, f"a{i}") for i in range(rng.randint(1, 4))
        ]
        having = None
        int_aggs = [a.alias for a in aggs if a.numeric_int]
        if keys and int_aggs and rng.random() < 0.3:
            having = (
                rng.choice(int_aggs),
                rng.choice([">", ">=", "<"]),
                rng.choice([1, 3, 10]),
            )
        spec = AggSpec(t.name, pred, keys, aggs, having)
    elif kind == "join":
        left, right, lkey, rkey = JOINS[rng.randrange(len(JOINS))]
        lt, rt = CATALOG[left], CATALOG[right]
        how = rng.choice(["inner", "inner", "left", "semi", "anti"])
        lpred = gen_pred(rng, lt, depth=1) if rng.random() < 0.7 else None
        rpred = gen_pred(rng, rt, depth=1) if rng.random() < 0.7 else None
        group = rng.choice(lt.lowcard) if rng.random() < 0.6 else None
        # aggregates draw from the LEFT table only (semi/anti expose
        # no right columns; keeping one arm simple keeps it correct)
        aggs = [gen_agg(rng, lt, f"a{i}") for i in range(rng.randint(1, 3))]
        spec = JoinSpec(left, right, lkey, rkey, how, lpred, rpred, group, aggs)
    elif kind == "setop":
        t = CATALOG[rng.choice(list(CATALOG))]
        out = rng.sample(
            [c.name for c in t.cols], rng.randint(1, min(3, len(t.cols)))
        )
        op = rng.choice(
            ["union_all", "union", "except_all", "except",
             "intersect_all", "intersect"]
        )
        lpred = gen_pred(rng, t, depth=1) if rng.random() < 0.85 else None
        rpred = gen_pred(rng, t, depth=1) if rng.random() < 0.85 else None
        spec = SetOpSpec(t.name, out, op, lpred, rpred)
    elif kind == "agg2":
        t = CATALOG[rng.choice(list(CATALOG))]
        pred = gen_pred(rng, t, depth=1) if rng.random() < 0.6 else None
        key = rng.choice(t.lowcard)
        inner = [gen_agg(rng, t, f"i{j}") for j in range(rng.randint(1, 3))]
        outer = []
        for j in range(rng.randint(1, 3)):
            if rng.random() < 0.2:
                outer.append((f"o{j}", "count", "*"))
                continue
            src = rng.choice(inner)
            fn = rng.choice(_OUTER_FNS[src.otyp])
            outer.append((f"o{j}", fn, src.alias))
        spec = Agg2Spec(t.name, pred, key, inner, outer)
    else:
        # window shapes need a TOTAL order: unique-keyed tables only
        t = CATALOG[rng.choice(["events", "orders", "documents"])]
        pred = gen_pred(rng, t, depth=1) if rng.random() < 0.6 else None
        part = rng.choice(t.lowcard)
        oc = rng.choice([c.name for c in t.cols if c.typ in "ift"])
        order = [(oc, rng.random() < 0.7)]
        for u in t.unique:
            if u != oc:
                order.append((u, True))
        funcs = []
        numerics = [c.name for c in t.cols if c.typ in "if"]
        for i in range(rng.randint(1, 3)):
            k = rng.choice(
                ["row_number", "rank", "dense_rank", "lag", "lead",
                 "cumsum", "rows_min"]
            )
            arg = rng.choice(numerics) if k not in (
                "row_number", "rank", "dense_rank"
            ) else None
            frame_k = rng.choice([1, 3, 10]) if k == "rows_min" else None
            funcs.append((f"w{i}", k, arg, frame_k))
        spec = WindowSpec(t.name, pred, part, order, funcs)
    return Case(seed, kind, spec)


# ---------------------------------------------------------------------------
# grammar v2 (round 12): the weird half of the surface.  Kept as a
# SEPARATE generator so the v1 seed corpus (3000 seeds green across
# rounds 10-11) stays bit-reproducible — changing gen_case's choice
# list would remap every historical seed.
#
# New shapes (r11 verdict item 2):
#   join3    — 3-table chains and stars (join reordering, null fan-out)
#   subq     — scalar (global + correlated) and [NOT] EXISTS subqueries
#   gsets    — ROLLUP / CUBE / GROUPING SETS with grouping_id
#   lambda   — higher-order array lambdas over embeddings.embedding
#              (fold/transform/filter/slice/element access)
#   strfn    — deep string-function compositions over documents.text
#   rangewin — RANGE window frames, plus EXCLUDE CURRENT ROW rendered
#              NATIVELY in DuckDB vs EMULATED in Spark (range sum minus
#              current row, NULL-guarded by frame count) — a true
#              cross-engine semantics differential
#
# Determinism rules inherited from v1, plus:
#   - scalar subqueries compare against min/max/count only (exact at
#     any summation order; an avg boundary could flip a > at the ulp);
#   - array folds cast f32 elements to double FIRST (exact), then
#     quantize the fold at 4 digits (64-element double sums agree far
#     below 1e-4 at any association order);
#   - RANGE frames are value-defined, hence total-order-free: legal
#     even on lineitem (no unique key), unlike the v1 ROWS shapes.
# ---------------------------------------------------------------------------

EMB_T = Table(
    "embeddings",
    (
        Col("vec_id", "i", (1, 100, 400)),
        Col("label", "i", (0, 3, 7)),
    ),
    ("vec_id",),
    ("label",),
)

CHAINS3 = [
    # (shape, t1, t2, t3, (k1, k2_of_t2), (k_from, k3_of_t3))
    # chain: T1-T2 on k1=k2, T2-T3 on j_from(t2)=k3
    ("chain", "lineitem", "orders", "customer",
     ("l_orderkey", "o_orderkey"), ("o_custkey", "c_custkey")),
    # star: T1-T2 on k1=k2, T1-T3 on j_from(t1)=k3
    ("star", "lineitem", "orders", "part",
     ("l_orderkey", "o_orderkey"), ("l_partkey", "p_partkey")),
]

SUBQ_PAIRS = [
    # (outer, inner, outer key, inner key, outer cmp col, inner num col)
    ("customer", "orders", "c_custkey", "o_custkey",
     "c_acctbal", "o_totalprice"),
    ("orders", "lineitem", "o_orderkey", "l_orderkey",
     "o_totalprice", "l_extendedprice"),
    ("part", "lineitem", "p_partkey", "l_partkey",
     "p_retailprice", "l_quantity"),
]


@dataclass
class Join3Spec:
    shape: str  # chain / star
    t1: str
    t2: str
    t3: str
    j1: tuple[str, str]
    j2: tuple[str, str]
    how1: str  # inner / left
    how2: str
    p1: Ex | None
    p2: Ex | None
    p3: Ex | None
    group: str | None  # t1 lowcard
    aggs: list[AggEx]  # over t1 columns


@dataclass
class SubqSpec:
    form: str  # scalar / scalar_corr / exists / not_exists
    outer: str
    inner: str
    okey: str | None  # correlation keys (corr forms)
    ikey: str | None
    cmp_col: str | None  # scalar forms: outer column compared
    fn: str | None  # min / max / count over the inner column
    icol: str | None
    opred: Ex | None
    ipred: Ex | None
    out: list[str]


@dataclass
class GSetsSpec:
    table: str
    pred: Ex | None
    keys: list[str]  # 1-2 lowcard columns
    mode: str  # rollup / cube / sets
    sets: list[list[str]]  # for mode == sets
    aggs: list[AggEx]


@dataclass
class LambdaSpec:
    pred: Ex | None  # over vec_id / label
    shapes: list[tuple[str, str, object]]  # (alias, kind, param)


@dataclass
class StrFnSpec:
    pred: Ex | None
    derived: list[tuple[str, Ex]]


@dataclass
class RangeWinSpec:
    table: str
    pred: Ex | None
    part: str
    oc: str  # numeric order column (value-defined frame: ties OK)
    funcs: list[tuple[str, str, str, int]]  # (alias, fn, argcol, k)


@dataclass
class WinJoinSpec:
    """Window function over a JOIN result — exercises window-after-
    join planning parity.  orders ⋈ customer only: o_orderkey stays
    unique in the joined result (each order has one customer), so
    ranking orders are total."""

    lpred: Ex | None  # orders side
    rpred: Ex | None  # customer side
    how: str  # inner / left
    part: str  # lowcard from either table
    oc: str  # numeric order col (o_totalprice / c_acctbal)
    funcs: list[tuple[str, str, str | None]]  # (alias, kind, argcol)


@dataclass
class LambdaJoinSpec:
    """Array lambdas over an embeddings ⋈ documents join (vec_id =
    doc_id) — the LLM-pipeline shape: per-doc features from both the
    text metadata and the embedding array in one query."""

    dpred: Ex | None  # documents side
    group: str | None  # documents lowcard (lang / source)
    shapes: list[tuple[str, str, object]]  # lambda shapes (gen-time params)


def _str_expr(rng: random.Random, depth: int) -> Ex:
    """A string-typed composition over documents text/lang/source."""
    t = CATALOG["documents"]
    base = rng.choice(["text", "text", "lang", "source"])
    e = Ex(F.col(base), base, "s")
    for _ in range(depth):
        r = rng.random()
        if r < 0.2:
            p, n = rng.randint(1, 6), rng.randint(1, 8)
            e = Ex(F.substring(e.sp, p, n), f"substr({e.sql}, {p}, {n})", "s")
        elif r < 0.35:
            fn = rng.choice(["upper", "lower"])
            e = Ex(getattr(F, fn)(e.sp), f"{fn}({e.sql})", "s")
        elif r < 0.45:
            e = Ex(F.trim(e.sp), f"trim({e.sql})", "s")
        elif r < 0.6:
            src, dst = rng.choice(
                [("ae", "_x"), ("eo", "31"), ("t ", "T-")]
            )
            e = Ex(
                F.translate(e.sp, src, dst),
                f"translate({e.sql}, '{src}', '{dst}')",
                "s",
            )
        elif r < 0.72:
            fn = rng.choice(["lpad", "rpad"])
            n = rng.randint(1, 12)
            e = Ex(
                getattr(F, fn)(e.sp, n, "*"),
                f"{fn}({e.sql}, {n}, '*')",
                "s",
            )
        elif r < 0.85:
            lit = rng.choice(["_", "-x", "Q"])
            if rng.random() < 0.5:
                e = Ex(
                    F.concat(e.sp, F.lit(lit)),
                    f"({e.sql} || '{lit}')",
                    "s",
                )
            else:
                other = Ex(F.col("lang"), "lang", "s")
                e = Ex(
                    F.concat(e.sp, other.sp),
                    f"({e.sql} || {other.sql})",
                    "s",
                )
        else:
            k = rng.randint(1, 6)
            e = Ex(
                F.try_element_at(F.split(e.sp, " "), F.lit(k)),
                f"string_split({e.sql}, ' ')[{k}]",
                "s",
            )
    # terminal: keep string, or project to an exact integer
    r = rng.random()
    if r < 0.25:
        return Ex(
            F.length(e.sp).cast("bigint"),
            f"CAST(length({e.sql}) AS BIGINT)",
            "i",
        )
    if r < 0.4:
        needle = rng.choice(["the", "a", "er"])
        return Ex(
            F.instr(e.sp, needle).cast("bigint"),
            f"CAST(strpos({e.sql}, '{needle}') AS BIGINT)",
            "i",
        )
    return e


_LAMBDA_SHAPES = ("sumsq", "fold_sum", "npos", "maxel", "minel",
                  "elem", "slice_sum")


def _lambda_param(rng: random.Random, kind: str):
    """Draw the shape's parameter at GEN time (render must be
    deterministic from the spec for shrink/repro)."""
    if kind == "npos":
        return rng.choice([-0.1, 0.0, 0.05, 0.1])
    if kind == "elem":
        return rng.choice([1, 7, 64, 65])  # 65 = out-of-range -> NULL
    if kind == "slice_sum":
        return rng.choice([4, 16, 32])
    return None


def _lambda_ex(kind: str, alias: str, param):
    """(spark Column, duckdb SQL) for one array shape."""
    cast_d = "transform(embedding, x -> CAST(x AS DOUBLE))"
    duck_d = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    if kind == "sumsq":
        sp = F.expr(
            "floor(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) "
            "* CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            f" * 10000 + 0.5) / 10000"
        ).alias(alias)
        sql = (
            "floor(list_aggregate(list_transform(embedding, x -> "
            "CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') * 10000 + 0.5) "
            f"/ 10000 AS {alias}"
        )
        return sp, sql
    if kind == "fold_sum":
        sp = F.expr(
            f"floor(aggregate({cast_d}, CAST(0.0 AS DOUBLE), "
            "(acc, x) -> acc + x) * 10000 + 0.5) / 10000"
        ).alias(alias)
        sql = (
            f"floor(list_aggregate({duck_d}, 'sum') * 10000 + 0.5) "
            f"/ 10000 AS {alias}"
        )
        return sp, sql
    if kind == "npos":
        c = param
        sp = F.expr(
            f"CAST(size(filter(embedding, x -> CAST(x AS DOUBLE) > {c!r}))"
            " AS BIGINT)"
        ).alias(alias)
        sql = (
            f"CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > "
            f"{c!r})) AS BIGINT) AS {alias}"
        )
        return sp, sql
    if kind in ("maxel", "minel"):
        fn = "max" if kind == "maxel" else "min"
        sp = F.expr(
            f"floor(array_{fn}({cast_d}) * 1000000 + 0.5) / 1000000"
        ).alias(alias)
        sql = (
            f"floor(list_aggregate({duck_d}, '{fn}') * 1000000 + 0.5) "
            f"/ 1000000 AS {alias}"
        )
        return sp, sql
    if kind == "elem":
        k = param
        sp = F.expr(
            f"floor(CAST(try_element_at(embedding, {k}) AS DOUBLE) "
            "* 1000000 + 0.5) / 1000000"
        ).alias(alias)
        sql = (
            f"floor(CAST(embedding[{k}] AS DOUBLE) * 1000000 + 0.5) "
            f"/ 1000000 AS {alias}"
        )
        return sp, sql
    # slice_sum
    k = param
    sp = F.expr(
        f"floor(aggregate(transform(slice(embedding, 1, {k}), "
        "x -> CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        " * 10000 + 0.5) / 10000"
    ).alias(alias)
    sql = (
        f"floor(list_aggregate(list_transform(list_slice(embedding, 1, "
        f"{k}), x -> CAST(x AS DOUBLE)), 'sum') * 10000 + 0.5) / 10000 "
        f"AS {alias}"
    )
    return sp, sql


def gen_case2(seed: int) -> Case:
    """Grammar v2: sample one of the round-12 shapes."""
    rng = random.Random(seed ^ 0x5EED12)
    kind = rng.choice(
        ["join3", "subq", "gsets", "lambda", "strfn", "rangewin",
         "winjoin", "lambda_join"]
    )
    if kind == "join3":
        shape, t1, t2, t3, j1, j2 = CHAINS3[rng.randrange(len(CHAINS3))]
        c1, c2, c3 = CATALOG[t1], CATALOG[t2], CATALOG[t3]
        how1 = rng.choice(["inner", "inner", "left"])
        how2 = rng.choice(["inner", "inner", "left"])
        p1 = gen_pred(rng, c1, depth=1) if rng.random() < 0.6 else None
        p2 = gen_pred(rng, c2, depth=1) if rng.random() < 0.6 else None
        p3 = gen_pred(rng, c3, depth=1) if rng.random() < 0.6 else None
        group = rng.choice(c1.lowcard) if rng.random() < 0.7 else None
        aggs = [gen_agg(rng, c1, f"a{i}") for i in range(rng.randint(1, 3))]
        spec = Join3Spec(
            shape, t1, t2, t3, j1, j2, how1, how2, p1, p2, p3, group, aggs
        )
    elif kind == "subq":
        form = rng.choice(["scalar", "scalar_corr", "exists", "not_exists"])
        if form == "scalar":
            t = CATALOG[rng.choice(list(CATALOG))]
            nums = [c.name for c in t.cols if c.typ in "if"]
            cmp_col, icol = rng.choice(nums), rng.choice(nums)
            fn = rng.choice(["min", "max"])
            opred = gen_pred(rng, t, depth=1) if rng.random() < 0.5 else None
            ipred = gen_pred(rng, t, depth=1) if rng.random() < 0.7 else None
            out = rng.sample(
                [c.name for c in t.cols if c.typ != "f"] or [cmp_col],
                k=min(3, max(1, len([c for c in t.cols if c.typ != "f"]))),
            )
            spec = SubqSpec(
                form, t.name, t.name, None, None, cmp_col, fn, icol,
                opred, ipred, out,
            )
        else:
            outer, inner, okey, ikey, ocmp, icol = SUBQ_PAIRS[
                rng.randrange(len(SUBQ_PAIRS))
            ]
            ot, it = CATALOG[outer], CATALOG[inner]
            opred = gen_pred(rng, ot, depth=1) if rng.random() < 0.5 else None
            ipred = gen_pred(rng, it, depth=1) if rng.random() < 0.7 else None
            out = rng.sample(
                [c.name for c in ot.cols], rng.randint(1, min(3, len(ot.cols)))
            )
            fn = rng.choice(["min", "max", "count"])
            spec = SubqSpec(
                form, outer, inner, okey, ikey, ocmp, fn, icol,
                opred, ipred, out,
            )
    elif kind == "gsets":
        t = CATALOG[rng.choice(list(CATALOG))]
        pred = gen_pred(rng, t, depth=1) if rng.random() < 0.6 else None
        nk = rng.randint(1, min(2, len(t.lowcard)))
        keys = rng.sample(list(t.lowcard), nk)
        mode = rng.choice(["rollup", "cube", "sets"])
        sets: list[list[str]] = []
        if mode == "sets":
            # the FULL key set must always be one of the sets: DuckDB's
            # binder requires every GROUPING() child (and every selected
            # key) to be a grouping column in some set (seed 25 of this
            # grammar's first run); prefixes + the last key alone are
            # optional extras
            cand = [keys[:i] for i in range(len(keys))]
            if len(keys) == 2:
                cand.append([keys[1]])
            extra = {tuple(s) for s in cand if rng.random() < 0.6}
            sets = [list(keys)] + [list(s) for s in sorted(extra)]
        aggs = [gen_agg(rng, t, f"a{i}") for i in range(rng.randint(1, 3))]
        spec = GSetsSpec(t.name, pred, keys, mode, sets, aggs)
    elif kind == "lambda":
        pred = gen_pred(rng, EMB_T, depth=1) if rng.random() < 0.6 else None
        shapes = []
        for i in range(rng.randint(1, 3)):
            k = rng.choice(_LAMBDA_SHAPES)
            shapes.append((f"s{i}", k, _lambda_param(rng, k)))
        spec = LambdaSpec(pred, shapes)
    elif kind == "strfn":
        t = CATALOG["documents"]
        pred = gen_pred(rng, t, depth=1) if rng.random() < 0.6 else None
        derived = [
            (f"d{i}", _str_expr(rng, rng.randint(1, 4)))
            for i in range(rng.randint(1, 3))
        ]
        spec = StrFnSpec(pred, derived)
    elif kind == "winjoin":
        ot, ct = CATALOG["orders"], CATALOG["customer"]
        lpred = gen_pred(rng, ot, depth=1) if rng.random() < 0.6 else None
        rpred = gen_pred(rng, ct, depth=1) if rng.random() < 0.6 else None
        how = rng.choice(["inner", "inner", "left"])
        part = rng.choice(list(ot.lowcard) + (
            [] if how == "left" else list(ct.lowcard)
        ))  # a left-join NULL partition key is legal but c_* keys on
        # unmatched rows group all-NULL either way; keep orders keys
        # for left joins so the partition is never synthetic-NULL
        oc = rng.choice(["o_totalprice", "o_custkey"])
        funcs = []
        for i in range(rng.randint(1, 3)):
            k = rng.choice(["row_number", "rank", "dense_rank", "cumsum"])
            arg = "o_totalprice" if k == "cumsum" else None
            funcs.append((f"w{i}", k, arg))
        spec = WinJoinSpec(lpred, rpred, how, part, oc, funcs)
    elif kind == "lambda_join":
        dt = CATALOG["documents"]
        dpred = gen_pred(rng, dt, depth=1) if rng.random() < 0.6 else None
        group = rng.choice(dt.lowcard) if rng.random() < 0.6 else None
        shapes = []
        for i in range(rng.randint(1, 2)):
            k = rng.choice(_LAMBDA_SHAPES)
            shapes.append((f"s{i}", k, _lambda_param(rng, k)))
        spec = LambdaJoinSpec(dpred, group, shapes)
    else:  # rangewin
        t = CATALOG[rng.choice(list(CATALOG))]
        pred = gen_pred(rng, t, depth=1) if rng.random() < 0.5 else None
        part = rng.choice(t.lowcard)
        nums = [c.name for c in t.cols if c.typ in "if"]
        # a numeric lowcard (user_id, p_size) can be the partition col;
        # ordering by it too would duplicate the output column and is a
        # degenerate frame anyway (every peer at distance 0)
        oc = rng.choice([n for n in nums if n != part] or nums)
        funcs = []
        for i in range(rng.randint(1, 3)):
            fn = rng.choice(
                ["sum", "count", "min", "max", "sum_excl", "sum_excl"]
            )
            arg = rng.choice(nums)
            k = rng.choice([1, 3, 10, 100])
            funcs.append((f"w{i}", fn, arg, k))
        spec = RangeWinSpec(t.name, pred, part, oc, funcs)
    return Case(seed, kind, spec)


# --- grammar v3 (round 13, r12 verdict item 5): the surfaces v1+v2 ---------
# left unfuzzed — batch-twin STREAMING window specs (random tumbling/
# sliding/session widths vs DuckDB time_bucket / epoch arithmetic /
# gap-island twins), interval theta-join shapes vs DuckDB IEJoin,
# VARIANT/JSON path extraction over events.props, and set-ops over
# grouped-rollup compositions (which EXERCISE the q_sql_empty_rollup
# grand-row idiom across a whole sampled space: any branch a random
# predicate empties hits the known Spark empty-rollup divergence, and
# the idiom must restore standard semantics for the set op to agree).
#
# Window-twin parity assumptions, verified at the fuzz fixture
# (sf0.001): event timestamps are whole seconds (the DuckDB twins
# floor epoch(ts)); widths are divisors of 24 h so Spark's epoch-0
# window origin and DuckDB's midnight-aligned time_bucket origin
# (2000-01-01, itself a whole multiple of any day-dividing width
# since 86400 | epoch(2000-01-01)) land on the same boundaries.


@dataclass
class TwinWindowSpec:
    form: str  # tumbling | sliding | session
    width_min: int  # window width (tumbling/sliding)
    slide_min: int  # sliding only; divides width
    gap_min: int  # session only
    keyed: bool  # ALSO group by user_id (tumbling/sliding)
    pred: Ex | None
    aggs: list[AggEx]


@dataclass
class IvlJoinSpec:
    ta: str  # left event type
    tb: str  # right event type
    la_min: int  # left interval length, minutes
    lb_min: int  # right interval length, minutes
    cell_sec: int  # grid-cell width for the Spark side
    rel: str  # overlap | starts_within
    pa: Ex | None
    pb: Ex | None


@dataclass
class JsonPathSpec:
    form: str  # project | group
    derived: list[tuple[str, str, str]]  # (alias, path, cast: i/f/s)
    pred: str | None  # SQL template over the first alias, {a} slot
    group_mod: int  # group form: GROUP BY extracted % mod


@dataclass
class SetRollupSpec:
    table: str
    keys: list[str]
    op: str  # unionall | union | exceptall | except | intersectall | intersect
    p1: Ex | None
    p2: Ex | None
    aggs: list[AggEx]


_TW_WIDTHS = (5, 10, 15, 30, 60, 120, 360)  # divisors of 24 h
_JSON_PATHS = ("$.k", "$.k", "$.k", "$.missing", "$.k.x")
_JSON_CASTS = ("i", "i", "f", "s")
_JSON_PREDS = (
    "{a} IS NULL",
    "{a} IS NOT NULL",
    "{a} % 3 != 2 OR {a} IS NULL",
    "{a} > 40 OR {a} IS NULL",
)


def gen_case3(seed: int) -> Case:
    """Grammar v3: sample one of the round-13 shapes."""
    rng = random.Random(seed ^ 0x5EED13)
    kind = rng.choice(["twin_window", "ivljoin", "jsonpath", "setrollup"])
    ev = CATALOG["events"]
    if kind == "twin_window":
        form = rng.choice(["tumbling", "tumbling", "sliding", "session"])
        width = rng.choice(_TW_WIDTHS)
        divs = [d for d in _TW_WIDTHS if d < width and width % d == 0]
        slide = rng.choice(divs) if divs else 5
        if form == "sliding" and not divs:
            form = "tumbling"
        gap = rng.choice((5, 10, 20, 30, 60))
        keyed = form != "session" and rng.random() < 0.5
        pred = gen_pred(rng, ev, depth=1) if rng.random() < 0.5 else None
        aggs = [gen_agg(rng, ev, f"a{i}") for i in range(rng.randint(1, 3))]
        spec = TwinWindowSpec(form, width, slide, gap, keyed, pred, aggs)
    elif kind == "ivljoin":
        types = ["click", "view", "purchase", "signup", "error"]
        ta, tb = rng.sample(types, 2)
        spec = IvlJoinSpec(
            ta,
            tb,
            rng.choice((5, 15, 30, 60)),
            rng.choice((5, 15, 30, 60)),
            rng.choice((300, 900, 1800, 3600)),
            rng.choice(["overlap", "overlap", "starts_within"]),
            gen_pred(rng, ev, depth=1) if rng.random() < 0.4 else None,
            gen_pred(rng, ev, depth=1) if rng.random() < 0.4 else None,
        )
    elif kind == "jsonpath":
        form = rng.choice(["project", "project", "group"])
        derived = []
        for i in range(rng.randint(1, 3)):
            path = rng.choice(_JSON_PATHS)
            cast = rng.choice(_JSON_CASTS)
            if cast == "s" and path != "$.k":
                # The uncast string path compares engine JSON-text
                # serialization verbatim; only $.k is known scalar in
                # the fixture schema, so any other path under 's'
                # could surface formatting (not semantics) as a
                # spurious divergence (r13 ADVICE).  Casts to
                # BIGINT/DOUBLE normalize non-scalars to NULL on both
                # engines, so they stay legal on every path.
                cast = "i"
            derived.append((f"j{i}", path, cast))
        pred = None
        if form == "project" and rng.random() < 0.6:
            tmpl = rng.choice(_JSON_PREDS)
            if "%" in tmpl or ">" in tmpl:
                # modulo/comparison templates pin an integer cast
                derived[0] = (derived[0][0], derived[0][1], "i")
            pred = tmpl
        spec = JsonPathSpec(form, derived, pred, rng.choice((3, 5, 7)))
    else:  # setrollup
        t = CATALOG[rng.choice(["orders", "events", "documents", "lineitem"])]
        nk = rng.randint(1, min(2, len(t.lowcard)))
        keys = rng.sample(list(t.lowcard), nk)
        op = rng.choice(
            ["unionall", "union", "exceptall", "except",
             "intersectall", "intersect"]
        )
        # predicate pools lean selective so some branches go EMPTY —
        # that is the point: every empty branch exercises the
        # empty-rollup idiom under a different set op
        p1 = gen_pred(rng, t, depth=1) if rng.random() < 0.7 else None
        p2 = gen_pred(rng, t, depth=1) if rng.random() < 0.7 else None
        aggs = [gen_agg(rng, t, f"a{i}") for i in range(rng.randint(1, 2))]
        spec = SetRollupSpec(t.name, keys, op, p1, p2, aggs)
    return Case(seed, kind, spec)


# --- renderers -------------------------------------------------------------


def _base_df(spark, sf_dir: str, table: str) -> DataFrame:
    from skyhookdb_ceph_spark.catalog import Catalog

    return getattr(Catalog(spark, sf_dir), table)


def _render_join3(s: Join3Spec, spark, sf_dir: str):
    d1 = _base_df(spark, sf_dir, s.t1)
    d2 = _base_df(spark, sf_dir, s.t2)
    d3 = _base_df(spark, sf_dir, s.t3)
    if s.p1 is not None:
        d1 = d1.filter(s.p1.sp)
    if s.p2 is not None:
        d2 = d2.filter(s.p2.sp)
    if s.p3 is not None:
        d3 = d3.filter(s.p3.sp)
    lk, mk = s.j1
    jk, rk = s.j2
    joined = d1.join(d2, F.col(lk) == F.col(mk), s.how1).join(
        d3, F.col(jk) == F.col(rk), s.how2
    )
    gcols = [s.group] if s.group else []
    if gcols:
        out = joined.groupBy(*gcols).agg(*[a.sp for a in s.aggs])
    else:
        out = joined.agg(*[a.sp for a in s.aggs])
    w1 = f" WHERE {s.p1.sql}" if s.p1 is not None else ""
    w2 = f" WHERE {s.p2.sql}" if s.p2 is not None else ""
    w3 = f" WHERE {s.p3.sql}" if s.p3 is not None else ""
    j1 = "JOIN" if s.how1 == "inner" else "LEFT JOIN"
    j2 = "JOIN" if s.how2 == "inner" else "LEFT JOIN"
    # jk lives on T2 for chains, on T1 for stars — bare names are
    # unique across TPC-H tables, so unqualified refs are unambiguous
    frm = (
        f"(SELECT * FROM {s.t1}{w1}) T1 "
        f"{j1} (SELECT * FROM {s.t2}{w2}) T2 ON {lk} = {mk} "
        f"{j2} (SELECT * FROM {s.t3}{w3}) T3 ON {jk} = {rk}"
    )
    cols = gcols + [a.sql for a in s.aggs]
    sql = f"SELECT {', '.join(cols)} FROM {frm}"
    if gcols:
        sql += f" GROUP BY {', '.join(gcols)}"
    return out, sql


def _render_subq(s: SubqSpec, spark, sf_dir: str):
    odf = _base_df(spark, sf_dir, s.outer)
    idf = _base_df(spark, sf_dir, s.inner)
    if s.opred is not None:
        odf = odf.filter(s.opred.sp)
    if s.ipred is not None:
        idf = idf.filter(s.ipred.sp)
    iw = f" WHERE {s.ipred.sql}" if s.ipred is not None else ""
    ow = f" WHERE {s.opred.sql}" if s.opred is not None else ""
    cols = ", ".join(s.out)
    if s.form == "scalar":
        fnsp = {"min": F.min, "max": F.max}[s.fn]
        sub = idf.agg(fnsp(s.icol).alias("_sv"))
        out = (
            odf.crossJoin(sub)
            .filter(F.col(s.cmp_col) > F.col("_sv"))
            .select(*s.out)
        )
        conj = "AND" if s.opred is not None else "WHERE"
        sql = (
            f"SELECT {cols} FROM {s.outer}{ow} {conj} {s.cmp_col} > "
            f"(SELECT {s.fn}({s.icol}) FROM {s.inner}{iw})"
        )
        return out, sql
    if s.form in ("exists", "not_exists"):
        how = "semi" if s.form == "exists" else "anti"
        out = odf.join(
            idf, F.col(s.okey) == F.col(s.ikey), how
        ).select(*s.out)
        neg = "NOT " if s.form == "not_exists" else ""
        sql = (
            f"SELECT {cols} FROM (SELECT * FROM {s.outer}{ow}) O "
            f"WHERE {neg}EXISTS "
            f"(SELECT 1 FROM (SELECT * FROM {s.inner}{iw}) I "
            f"WHERE I.{s.ikey} = O.{s.okey})"
        )
        return out, sql
    # scalar_corr: outer.cmp > (SELECT fn(icol) FROM inner WHERE corr)
    if s.fn == "count":
        agg = idf.groupBy(s.ikey).agg(
            F.count(F.lit(1)).cast("bigint").alias("_sv")
        )
        fn_sql = "CAST(count(*) AS BIGINT)"
    else:
        fnsp = {"min": F.min, "max": F.max}[s.fn]
        agg = idf.groupBy(s.ikey).agg(fnsp(s.icol).alias("_sv"))
        fn_sql = f"{s.fn}({s.icol})"
    out = (
        odf.join(agg, F.col(s.okey) == F.col(s.ikey), "inner")
        .filter(F.col(s.cmp_col) > F.col("_sv"))
        .select(*s.out)
    )
    # NOTE count form: a correlated (SELECT count(*)) is 0 for no-match
    # rows in SQL, which the Spark inner-join render would NOT match —
    # so the SQL side also goes through an explicit grouped subquery
    # join, keeping both renders the same algebra (the differential
    # still exercises DuckDB's decorrelation of the grouped join).
    sql = (
        f"SELECT {cols} FROM {s.outer} O JOIN "
        f"(SELECT {s.ikey} AS _ik, {fn_sql} AS _sv FROM {s.inner}{iw} "
        f"GROUP BY {s.ikey}) g ON O.{s.okey} = g._ik "
        f"WHERE {s.cmp_col} > _sv"
        + (f" AND ({s.opred.sql})" if s.opred is not None else "")
    )
    return out, sql


def _render_gsets(s: GSetsSpec, spark, sf_dir: str):
    df = _base_df(spark, sf_dir, s.table)
    if s.pred is not None:
        df = df.filter(s.pred.sp)
    gid = F.grouping_id().cast("bigint").alias("gid")
    if s.mode == "rollup":
        g = df.rollup(*s.keys)
        by = f"ROLLUP({', '.join(s.keys)})"
    elif s.mode == "cube":
        g = df.cube(*s.keys)
        by = f"CUBE({', '.join(s.keys)})"
    else:
        g = df.groupingSets(
            [[F.col(k) for k in sub] for sub in s.sets],
            *[F.col(k) for k in s.keys],
        )
        subs = ", ".join(f"({', '.join(sub)})" for sub in s.sets)
        by = f"GROUPING SETS ({subs})"
    out = g.agg(gid, *[a.sp for a in s.aggs]).select(
        *s.keys, "gid", *[a.alias for a in s.aggs]
    )
    w = f" WHERE {s.pred.sql}" if s.pred is not None else ""
    gsql = f"CAST(GROUPING({', '.join(s.keys)}) AS BIGINT) AS gid"
    sql = (
        f"SELECT {', '.join(s.keys)}, {gsql}, "
        f"{', '.join(a.sql for a in s.aggs)} "
        f"FROM {s.table}{w} GROUP BY {by}"
    )
    return out, sql


def _render_lambda(s: LambdaSpec, spark, sf_dir: str):
    df = _base_df(spark, sf_dir, "embeddings")
    if s.pred is not None:
        df = df.filter(s.pred.sp)
    sps, sqls = [F.col("vec_id")], ["vec_id"]
    for alias, kind, param in s.shapes:
        sp, sql = _lambda_ex(kind, alias, param)
        sps.append(sp)
        sqls.append(sql)
    out = df.select(*sps)
    w = f" WHERE {s.pred.sql}" if s.pred is not None else ""
    return out, f"SELECT {', '.join(sqls)} FROM embeddings{w}"


def _render_strfn(s: StrFnSpec, spark, sf_dir: str):
    df = _base_df(spark, sf_dir, "documents")
    if s.pred is not None:
        df = df.filter(s.pred.sp)
    sps = [F.col("doc_id")] + [ex.sp.alias(a) for a, ex in s.derived]
    sqls = ["doc_id"] + [f"{ex.sql} AS {a}" for a, ex in s.derived]
    out = df.select(*sps)
    w = f" WHERE {s.pred.sql}" if s.pred is not None else ""
    return out, f"SELECT {', '.join(sqls)} FROM documents{w}"


def _render_rangewin(s: RangeWinSpec, spark, sf_dir: str):
    t = CATALOG[s.table]
    df = _base_df(spark, sf_dir, s.table)
    if s.pred is not None:
        df = df.filter(s.pred.sp)
    over = (
        f"PARTITION BY {s.part} ORDER BY {s.oc} "
        "RANGE BETWEEN {k} PRECEDING AND CURRENT ROW"
    )
    sps = [F.col(s.part), F.col(s.oc)]
    sqls = [s.part, s.oc]
    for alias, fn, arg, k in s.funcs:
        ov = over.format(k=k)
        scale = 10 ** t.col(arg).sumq
        if fn == "count":
            sp = F.expr(f"CAST(count({arg}) OVER ({ov}) AS BIGINT)")
            sq = f"CAST(count({arg}) OVER ({ov}) AS BIGINT)"
        elif fn in ("min", "max"):
            sp = F.expr(f"CAST({fn}({arg}) OVER ({ov}) AS DOUBLE)")
            sq = f"CAST({fn}({arg}) OVER ({ov}) AS DOUBLE)"
        elif fn == "sum":
            # CAST to DOUBLE: an int-column sum is BIGINT in Spark and
            # HUGEINT in DuckDB; floor()/scale then lands in DECIMAL on
            # the Spark side (renders '16379.000000' vs '16379.0') —
            # found by seed 5 of this grammar's first run
            sp = F.expr(
                f"floor(CAST(sum({arg}) OVER ({ov}) AS DOUBLE) "
                f"* {scale} + 0.5) / {scale}"
            )
            sq = (
                f"floor(CAST(sum({arg}) OVER ({ov}) AS DOUBLE) "
                f"* {scale} + 0.5) / {scale}"
            )
        else:  # sum_excl — DuckDB native EXCLUDE vs Spark emulation
            sp = F.expr(
                f"CASE WHEN count({arg}) OVER ({ov}) > 1 THEN "
                f"floor(CAST(sum({arg}) OVER ({ov}) - {arg} AS DOUBLE) "
                f"* {scale} + 0.5) / {scale} END"
            )
            sq = (
                f"floor(CAST(sum({arg}) OVER ({ov} EXCLUDE CURRENT ROW) "
                f"AS DOUBLE) * {scale} + 0.5) / {scale}"
            )
        sps.append(sp.alias(alias))
        sqls.append(f"{sq} AS {alias}")
    out = df.select(*sps)
    w = f" WHERE {s.pred.sql}" if s.pred is not None else ""
    return out, f"SELECT {', '.join(sqls)} FROM {s.table}{w}"


def _render_winjoin(s: WinJoinSpec, spark, sf_dir: str):
    od = _base_df(spark, sf_dir, "orders")
    cd = _base_df(spark, sf_dir, "customer")
    if s.lpred is not None:
        od = od.filter(s.lpred.sp)
    if s.rpred is not None:
        cd = cd.filter(s.rpred.sp)
    joined = od.join(
        cd, F.col("o_custkey") == F.col("c_custkey"), s.how
    )
    ov = f"PARTITION BY {s.part} ORDER BY {s.oc}, o_orderkey"
    sps = [F.col("o_orderkey"), F.col(s.part)]
    sqls = ["o_orderkey", s.part]
    for alias, kind, arg in s.funcs:
        if kind == "cumsum":
            sq = (
                f"floor((sum({arg}) OVER ({ov} ROWS BETWEEN UNBOUNDED "
                f"PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100"
            )
        else:
            sq = f"CAST({kind}() OVER ({ov}) AS BIGINT)"
        sps.append(F.expr(sq).alias(alias))
        sqls.append(f"{sq} AS {alias}")
    out = joined.select(*sps)
    lw = f" WHERE {s.lpred.sql}" if s.lpred is not None else ""
    rw = f" WHERE {s.rpred.sql}" if s.rpred is not None else ""
    jt = "JOIN" if s.how == "inner" else "LEFT JOIN"
    sql = (
        f"SELECT {', '.join(sqls)} FROM (SELECT * FROM orders{lw}) O "
        f"{jt} (SELECT * FROM customer{rw}) C ON o_custkey = c_custkey"
    )
    return out, sql


def _render_lambda_join(s: LambdaJoinSpec, spark, sf_dir: str):
    dd = _base_df(spark, sf_dir, "documents")
    ed = _base_df(spark, sf_dir, "embeddings")
    if s.dpred is not None:
        dd = dd.filter(s.dpred.sp)
    joined = dd.join(ed, F.col("doc_id") == F.col("vec_id"))
    dw = f" WHERE {s.dpred.sql}" if s.dpred is not None else ""
    frm = (
        f"(SELECT * FROM documents{dw}) D JOIN embeddings E "
        "ON doc_id = vec_id"
    )
    shape_cols = [(_lambda_ex(k, a, p), a) for a, k, p in s.shapes]
    if s.group is None:
        sps = [F.col("doc_id")] + [c[0][0] for c in shape_cols]
        sqls = ["doc_id"] + [c[0][1] for c in shape_cols]
        out = joined.select(*sps)
        return out, f"SELECT {', '.join(sqls)} FROM {frm}"
    # grouped: min/max of each (already-quantized) shape + count —
    # exact at any aggregation order, unlike avg of doubles
    aggs_sp = [F.count(F.lit(1)).cast("bigint").alias("n")]
    aggs_sql = ["CAST(count(*) AS BIGINT) AS n"]
    inner_sqls = ["doc_id", s.group]
    inner_sps = [F.col("doc_id"), F.col(s.group)]
    for (sp, sq), alias in shape_cols:
        inner_sps.append(sp)
        inner_sqls.append(sq)
        for fn in ("min", "max"):
            aggs_sp.append(getattr(F, fn)(alias).alias(f"{fn}_{alias}"))
            aggs_sql.append(f"{fn}({alias}) AS {fn}_{alias}")
    out = joined.select(*inner_sps).groupBy(s.group).agg(*aggs_sp)
    sql = (
        f"SELECT {s.group}, {', '.join(aggs_sql)} FROM "
        f"(SELECT {', '.join(inner_sqls)} FROM {frm}) t GROUP BY {s.group}"
    )
    return out, sql


def _render_twin_window(s: TwinWindowSpec, spark, sf_dir: str):
    """Batch form of the streaming window specs vs a from-scratch
    DuckDB twin: tumbling -> time_bucket; sliding -> per-row explode
    of the covering windows in BIGINT epoch arithmetic; session ->
    the lag/gap-island idiom (a new session starts when the gap is
    >= the session gap, matching session_window's merge rule: an
    event extends a session iff it lands strictly inside
    last_event + gap).  Window identity crosses engines as BIGINT
    epoch seconds of the window start — no timestamp-type parity
    surface at all."""
    ev = _base_df(spark, sf_dir, "events")
    if s.pred is not None:
        ev = ev.filter(s.pred.sp)
    w_where = f" WHERE {s.pred.sql}" if s.pred is not None else ""
    agg_sp = [a.sp for a in s.aggs]
    agg_sql = ", ".join(a.sql for a in s.aggs)
    names = [a.alias for a in s.aggs]
    if s.form == "session":
        gap = s.gap_min * 60
        out = (
            ev.groupBy(
                "user_id",
                F.session_window("ts", f"{s.gap_min} minutes").alias("w"),
            )
            .agg(*agg_sp)
            .selectExpr(
                "user_id",
                "CAST(unix_timestamp(w.start) AS BIGINT) AS ws",
                *names,
            )
        )
        sql = f"""
WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ep
           FROM events{w_where}),
m AS (SELECT *, CASE WHEN lag(ep) OVER pw IS NULL
                       OR ep - lag(ep) OVER pw >= {gap}
                     THEN 1 ELSE 0 END AS brk
      FROM e WINDOW pw AS (PARTITION BY user_id ORDER BY ep, event_id)),
i AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ep, event_id
                               ROWS UNBOUNDED PRECEDING) AS isl
      FROM m)
SELECT user_id, CAST(min(ep) AS BIGINT) AS ws, {agg_sql}
FROM i GROUP BY user_id, isl"""
        return out, sql
    width = s.width_min * 60
    keys_sp = (["user_id"] if s.keyed else [])
    keys_sql = "user_id, " if s.keyed else ""
    grp_extra = ", user_id" if s.keyed else ""
    if s.form == "tumbling":
        out = (
            ev.groupBy(
                *keys_sp, F.window("ts", f"{s.width_min} minutes").alias("w")
            )
            .agg(*agg_sp)
            .selectExpr(
                *keys_sp,
                "CAST(unix_timestamp(w.start) AS BIGINT) AS ws",
                *names,
            )
        )
        sql = (
            f"SELECT {keys_sql}CAST(epoch(time_bucket("
            f"INTERVAL {s.width_min} MINUTE, ts)) AS BIGINT) AS ws, "
            f"{agg_sql} FROM events{w_where} GROUP BY ws{grp_extra}"
        )
        return out, sql
    slide = s.slide_min * 60
    out = (
        ev.groupBy(
            *keys_sp,
            F.window(
                "ts", f"{s.width_min} minutes", f"{s.slide_min} minutes"
            ).alias("w"),
        )
        .agg(*agg_sp)
        .selectExpr(
            *keys_sp,
            "CAST(unix_timestamp(w.start) AS BIGINT) AS ws",
            *names,
        )
    )
    sql = f"""
WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ep
           FROM events{w_where}),
x AS (SELECT *, ((ep // {slide}) - k) * {slide} AS ws
      FROM e, (SELECT unnest(generate_series(0, {width // slide - 1})) AS k)
      WHERE ep < ((ep // {slide}) - k) * {slide} + {width})
SELECT {keys_sql}ws, {agg_sql} FROM x GROUP BY ws{grp_extra}"""
    return out, sql


def _render_ivljoin(s: IvlJoinSpec, spark, sf_dir: str):
    """Grid-bucketed interval join (the q_join_interval_grid
    machinery at a RANDOM cell width / interval lengths / overlap
    relation) vs the naive theta join DuckDB plans as IEJoin.  The
    responsibility rule — only the cell containing
    greatest(a_ts, b_ts) emits — is width-invariant, which is
    exactly what this shape fuzzes."""
    ev = _base_df(spark, sf_dir, "events")
    cell = s.cell_sec

    def side(etype, ln, pred, p):
        df = ev.filter(F.col("event_type") == etype)
        if pred is not None:
            df = df.filter(pred.sp)
        return df.selectExpr(
            f"ts AS {p}_ts", f"ts + INTERVAL {ln} MINUTE AS {p}_end"
        ).withColumn(
            "cell",
            F.explode(
                F.expr(
                    f"sequence(CAST(floor(unix_timestamp({p}_ts) / {cell})"
                    f" AS BIGINT), CAST(floor(unix_timestamp({p}_end) / "
                    f"{cell}) AS BIGINT))"
                )
            ),
        )

    rel_sp = (
        "a_ts <= b_end AND b_ts <= a_end"
        if s.rel == "overlap"
        else "b_ts >= a_ts AND b_ts <= a_end"
    )
    out = (
        side(s.ta, s.la_min, s.pa, "a")
        .join(side(s.tb, s.lb_min, s.pb, "b"), "cell")
        .filter(rel_sp)
        .filter(
            f"CAST(floor(unix_timestamp(greatest(a_ts, b_ts)) / {cell}) "
            "AS BIGINT) = cell"
        )
        .selectExpr("CAST(to_date(greatest(a_ts, b_ts)) AS STRING) AS day")
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )

    def sql_side(etype, ln, pred, p):
        w = f" AND ({pred.sql})" if pred is not None else ""
        return (
            f"SELECT ts AS {p}_ts, ts + INTERVAL {ln} MINUTE AS {p}_end "
            f"FROM events WHERE event_type = '{etype}'{w}"
        )

    sql = f"""
WITH a AS ({sql_side(s.ta, s.la_min, s.pa, 'a')}),
b AS ({sql_side(s.tb, s.lb_min, s.pb, 'b')})
SELECT CAST(CAST(greatest(a_ts, b_ts) AS DATE) AS VARCHAR) AS day,
  CAST(count(*) AS BIGINT) AS n_pairs
FROM a, b WHERE {rel_sp}
GROUP BY 1"""
    return out, sql


_JSON_SPARK_T = {"i": "BIGINT", "f": "DOUBLE", "s": None}

# Paths whose extraction is a SCALAR under the fixture schema
# (events.props = {"k": int}).  The uncast 's' form compares engine
# JSON-text serialization verbatim, which is only semantics (not
# formatting) for scalars — the generator coerces 's' off other
# paths, and the renderer enforces it structurally so a future
# grammar edit cannot silently reopen the hole (r13/r14 ADVICE).
_JSON_SCALAR_PATHS = frozenset({"$.k"})


def _render_jsonpath(s: JsonPathSpec, spark, sf_dir: str):
    """JSON path extraction over events.props: get_json_object +
    CAST vs json_extract_string + CAST, including absent keys and
    paths past a leaf (NULL on both engines), lateral-alias
    predicates, and grouping by the extracted value."""
    ev = _base_df(spark, sf_dir, "events")

    def ex(path, cast, duck):
        fn = "json_extract_string" if duck else "get_json_object"
        base = f"{fn}(props, '{path}')"
        t = _JSON_SPARK_T[cast]
        if t is None and path not in _JSON_SCALAR_PATHS:
            raise ValueError(
                f"uncast 's' jsonpath on non-schema-known path {path!r}:"
                " JSON-text serialization would be compared verbatim;"
                " cast to BIGINT/DOUBLE (NULL-normalizing) instead"
            )
        return f"CAST({base} AS {t})" if t else base

    if s.form == "group":
        a, path, _ = s.derived[0]
        g_sp = f"CAST({ex(path, 'i', False)} % {s.group_mod} AS BIGINT)"
        g_du = f"CAST({ex(path, 'i', True)} % {s.group_mod} AS BIGINT)"
        out = (
            ev.selectExpr(f"{g_sp} AS g")
            .groupBy("g")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        sql = (
            f"SELECT {g_du} AS g, CAST(count(*) AS BIGINT) AS cnt "
            f"FROM events GROUP BY 1"
        )
        return out, sql
    sp_cols = ["event_id"] + [
        f"{ex(p, c, False)} AS {a}" for a, p, c in s.derived
    ]
    du_cols = ["event_id"] + [
        f"{ex(p, c, True)} AS {a}" for a, p, c in s.derived
    ]
    out = ev.selectExpr(*sp_cols)
    sql = f"SELECT {', '.join(du_cols)} FROM events"
    if s.pred is not None:
        cond = s.pred.format(a=s.derived[0][0])
        out = out.filter(cond)
        sql += f" WHERE {cond}"
    return out, sql


_SETROLLUP_OPS = {
    "unionall": (lambda a, b: a.unionAll(b), "UNION ALL"),
    "union": (lambda a, b: a.union(b).distinct(), "UNION"),
    "exceptall": (lambda a, b: a.exceptAll(b), "EXCEPT ALL"),
    "except": (lambda a, b: a.subtract(b), "EXCEPT"),
    "intersectall": (lambda a, b: a.intersectAll(b), "INTERSECT ALL"),
    "intersect": (lambda a, b: a.intersect(b), "INTERSECT"),
}


def _render_setrollup(s: SetRollupSpec, spark, sf_dir: str):
    """Set op between two ROLLUP branches of the same table under
    different random predicates.  The Spark side applies the
    q_sql_empty_rollup grand-row idiom to EACH branch (union the
    global aggregate guarded by its own count = 0), because a branch
    a predicate empties hits the known Spark divergence — zero rows
    where the standard emits the () grand-total row — and the set op
    would otherwise diverge.  The DuckDB side is the plain standard
    composition, so every seed certifies the idiom, not just the one
    registered artifact."""
    grand_gid = 2 ** len(s.keys) - 1
    null_keys = [
        f"CAST(NULL AS STRING) AS {k}"
        if next(c for c in CATALOG[s.table].cols if c.name == k).typ == "s"
        else f"CAST(NULL AS BIGINT) AS {k}"
        for k in s.keys
    ]

    def branch(pred):
        df = _base_df(spark, sf_dir, s.table)
        if pred is not None:
            df = df.filter(pred.sp)
        rolled = (
            df.rollup(*s.keys)
            .agg(
                F.grouping_id().cast("bigint").alias("gid"),
                *[a.sp for a in s.aggs],
            )
            .select(*s.keys, "gid", *[a.alias for a in s.aggs])
        )
        grand = (
            df.agg(
                F.count(F.lit(1)).alias("__n"), *[a.sp for a in s.aggs]
            )
            .filter("__n = 0")
            .selectExpr(
                *null_keys,
                f"CAST({grand_gid} AS BIGINT) AS gid",
                *[a.alias for a in s.aggs],
            )
        )
        return rolled.unionByName(grand)

    def branch_sql(pred):
        w = f" WHERE {pred.sql}" if pred is not None else ""
        return (
            f"SELECT {', '.join(s.keys)}, "
            f"CAST(GROUPING({', '.join(s.keys)}) AS BIGINT) AS gid, "
            f"{', '.join(a.sql for a in s.aggs)} "
            f"FROM {s.table}{w} GROUP BY ROLLUP({', '.join(s.keys)})"
        )

    sp_fn, sql_op = _SETROLLUP_OPS[s.op]
    out = sp_fn(branch(s.p1), branch(s.p2))
    sql = f"({branch_sql(s.p1)}) {sql_op} ({branch_sql(s.p2)})"
    return out, sql


_V2_RENDER = {
    "join3": _render_join3,
    "subq": _render_subq,
    "gsets": _render_gsets,
    "lambda": _render_lambda,
    "strfn": _render_strfn,
    "rangewin": _render_rangewin,
    "winjoin": _render_winjoin,
    "lambda_join": _render_lambda_join,
    # grammar v3
    "twin_window": _render_twin_window,
    "ivljoin": _render_ivljoin,
    "jsonpath": _render_jsonpath,
    "setrollup": _render_setrollup,
}


def render(case: Case, spark, sf_dir: str) -> tuple[DataFrame, str]:
    s = case.spec
    if case.kind in _V2_RENDER:
        return _V2_RENDER[case.kind](s, spark, sf_dir)
    if case.kind == "filter":
        t = CATALOG[s.table]
        df = _base_df(spark, sf_dir, s.table)
        sel_sql = list(dict.fromkeys(s.out))
        df_cols = [F.col(c) for c in sel_sql]
        for name, ex in s.derived:
            df_cols.append(ex.sp.alias(name))
        proj = df
        if s.pred is not None:
            proj = proj.filter(s.pred.sp)
        proj = proj.select(*df_cols)
        sql_cols = sel_sql + [
            f"{ex.sql} AS {name}" for name, ex in s.derived
        ]
        sql = f"SELECT {', '.join(sql_cols)} FROM {s.table}"
        if s.pred is not None:
            sql += f" WHERE {s.pred.sql}"
        if s.order_limit:
            keys, n = s.order_limit
            proj = proj.orderBy(*[F.col(k).asc() for k in keys]).limit(n)
            sql += f" ORDER BY {', '.join(keys)} LIMIT {n}"
        return proj, sql
    if case.kind == "agg":
        df = _base_df(spark, sf_dir, s.table)
        if s.pred is not None:
            df = df.filter(s.pred.sp)
        if s.keys:
            out = df.groupBy(
                *[ex.sp.alias(a) for a, ex in s.keys]
            ).agg(*[a.sp for a in s.aggs])
            key_sql = [f"{ex.sql} AS {a}" for a, ex in s.keys]
            grp = ", ".join(ex.sql for _, ex in s.keys)
            sql = (
                f"SELECT {', '.join(key_sql + [a.sql for a in s.aggs])} "
                f"FROM {s.table}"
                + (f" WHERE {s.pred.sql}" if s.pred is not None else "")
                + f" GROUP BY {grp}"
            )
        else:
            out = df.agg(*[a.sp for a in s.aggs])
            sql = (
                f"SELECT {', '.join(a.sql for a in s.aggs)} FROM {s.table}"
                + (f" WHERE {s.pred.sql}" if s.pred is not None else "")
            )
        if s.having:
            alias, op, lit = s.having
            out = out.filter(F.expr(f"{alias} {op} {lit}"))
            sql = f"SELECT * FROM ({sql}) h WHERE {alias} {op} {lit}"
        return out, sql
    if case.kind == "join":
        lt = CATALOG[s.left]
        ldf = _base_df(spark, sf_dir, s.left)
        rdf = _base_df(spark, sf_dir, s.right)
        if s.lpred is not None:
            ldf = ldf.filter(s.lpred.sp)
        if s.rpred is not None:
            rdf = rdf.filter(s.rpred.sp)
        cond = F.col(s.lkey) == F.col(s.rkey)
        joined = ldf.join(rdf, cond, s.how)
        gcols = [s.group] if s.group else []
        if gcols:
            out = joined.groupBy(*gcols).agg(*[a.sp for a in s.aggs])
        else:
            out = joined.agg(*[a.sp for a in s.aggs])
        lw = f" WHERE {s.lpred.sql}" if s.lpred is not None else ""
        rw = f" WHERE {s.rpred.sql}" if s.rpred is not None else ""
        lsub = f"(SELECT * FROM {s.left}{lw}) L"
        rsub = f"(SELECT * FROM {s.right}{rw}) R"
        if s.how in ("semi", "anti"):
            neg = "NOT " if s.how == "anti" else ""
            frm = (
                f"{lsub} WHERE {neg}EXISTS (SELECT 1 FROM {rsub} "
                f"WHERE R.{s.rkey} = L.{s.lkey})"
            )
        else:
            jt = "JOIN" if s.how == "inner" else "LEFT JOIN"
            frm = f"{lsub} {jt} {rsub} ON L.{s.lkey} = R.{s.rkey}"
        cols = gcols + [a.sql for a in s.aggs]
        sql = f"SELECT {', '.join(cols)} FROM {frm}"
        if gcols:
            sql += f" GROUP BY {', '.join(gcols)}"
        return out, sql
    if case.kind == "setop":
        df = _base_df(spark, sf_dir, s.table)
        l = df.filter(s.lpred.sp) if s.lpred is not None else df
        r = df.filter(s.rpred.sp) if s.rpred is not None else df
        l, r = l.select(*s.out), r.select(*s.out)
        out = {
            "union_all": lambda: l.unionByName(r),
            "union": lambda: l.unionByName(r).distinct(),
            "except_all": lambda: l.exceptAll(r),
            "except": lambda: l.subtract(r),
            "intersect_all": lambda: l.intersectAll(r),
            "intersect": lambda: l.intersect(r),
        }[s.op]()
        sql_op = {
            "union_all": "UNION ALL",
            "union": "UNION",
            "except_all": "EXCEPT ALL",
            "except": "EXCEPT",
            "intersect_all": "INTERSECT ALL",
            "intersect": "INTERSECT",
        }[s.op]
        lw = f" WHERE {s.lpred.sql}" if s.lpred is not None else ""
        rw = f" WHERE {s.rpred.sql}" if s.rpred is not None else ""
        cols = ", ".join(s.out)
        sql = (
            f"(SELECT {cols} FROM {s.table}{lw}) {sql_op} "
            f"(SELECT {cols} FROM {s.table}{rw})"
        )
        return out, sql
    if case.kind == "agg2":
        df = _base_df(spark, sf_dir, s.table)
        if s.pred is not None:
            df = df.filter(s.pred.sp)
        inner_df = df.groupBy(s.key).agg(*[a.sp for a in s.inner])
        otyp_of = {a.alias: a.otyp for a in s.inner}
        dflts = {
            "i": lit_ex(0, "i"),
            "f": lit_ex(0.0, "f"),
            "s": lit_ex("", "s"),
            "t": lit_ex("1970-01-01 00:00:00", "t"),
        }
        o_sp, o_sql = [], []
        for alias, fn, src in s.outer:
            if src == "*" or fn == "count":
                arg = F.lit(1) if src == "*" else F.col(src)
                a_sql = "*" if src == "*" else src
                o_sp.append(F.count(arg).cast("bigint").alias(alias))
                o_sql.append(f"CAST(count({a_sql}) AS BIGINT) AS {alias}")
            elif fn == "sum":  # int inner only (see _OUTER_FNS)
                o_sp.append(
                    F.coalesce(F.sum(src), F.lit(0))
                    .cast("bigint")
                    .alias(alias)
                )
                o_sql.append(
                    f"CAST(coalesce(sum({src}), 0) AS BIGINT) AS {alias}"
                )
            elif fn == "avg":  # int inner only — one division, exact sum
                o_sp.append(
                    F.coalesce(
                        F.floor(F.avg(src) * 1000000 + F.lit(0.5)) / 1000000,
                        F.lit(0.0),
                    ).alias(alias)
                )
                o_sql.append(
                    f"coalesce(floor((avg({src})) * 1000000 + 0.5) "
                    f"/ 1000000, 0.0) AS {alias}"
                )
            else:  # min / max over any orderable inner output
                d = dflts[otyp_of[src]]
                spf = F.min(F.col(src)) if fn == "min" else F.max(F.col(src))
                o_sp.append(F.coalesce(spf, d.sp).alias(alias))
                o_sql.append(
                    f"coalesce({fn}({src}), {d.sql}) AS {alias}"
                )
        out = inner_df.agg(*o_sp)
        w = f" WHERE {s.pred.sql}" if s.pred is not None else ""
        inner_sql = (
            f"SELECT {s.key}, {', '.join(a.sql for a in s.inner)} "
            f"FROM {s.table}{w} GROUP BY {s.key}"
        )
        sql = f"SELECT {', '.join(o_sql)} FROM ({inner_sql}) g"
        return out, sql
    # window
    t = CATALOG[s.table]
    df = _base_df(spark, sf_dir, s.table)
    if s.pred is not None:
        df = df.filter(s.pred.sp)
    ob = [F.col(c).asc() if asc else F.col(c).desc() for c, asc in s.order]
    ob_sql = ", ".join(f"{c} {'ASC' if asc else 'DESC'}" for c, asc in s.order)
    w = Window.partitionBy(s.part).orderBy(*ob)
    out_cols = [F.col(c) for c in t.unique] + [F.col(s.part)]
    sql_cols = list(t.unique) + [s.part]
    for alias, kind, arg, frame_k in s.funcs:
        if kind in ("row_number", "rank", "dense_rank"):
            sp = getattr(F, kind)().over(w).cast("bigint")
            sq = f"CAST({kind}() OVER (PARTITION BY {s.part} ORDER BY {ob_sql}) AS BIGINT)"
        elif kind in ("lag", "lead"):
            sp = getattr(F, kind)(F.col(arg), 1).over(w).cast("double")
            sq = (
                f"CAST({kind}({arg}, 1) OVER (PARTITION BY {s.part} "
                f"ORDER BY {ob_sql}) AS DOUBLE)"
            )
        elif kind == "cumsum":
            wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            scale = 10**4
            sp = F.floor(
                F.sum(F.col(arg)).over(wf) * scale + F.lit(0.5)
            ) / scale
            sq = (
                f"floor((sum({arg}) OVER (PARTITION BY {s.part} ORDER BY "
                f"{ob_sql} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
                f" * {scale} + 0.5) / {scale}"
            )
        else:  # rows_min
            wf = w.rowsBetween(-frame_k, Window.currentRow)
            sp = F.min(F.col(arg)).over(wf).cast("double")
            sq = (
                f"CAST(min({arg}) OVER (PARTITION BY {s.part} ORDER BY "
                f"{ob_sql} ROWS BETWEEN {frame_k} PRECEDING AND CURRENT ROW)"
                f" AS DOUBLE)"
            )
        out_cols.append(sp.alias(alias))
        sql_cols.append(f"{sq} AS {alias}")
    out = df.select(*out_cols)
    sql = f"SELECT {', '.join(sql_cols)} FROM {s.table}"
    if s.pred is not None:
        sql += f" WHERE {s.pred.sql}"
    return out, sql


# ---------------------------------------------------------------------------
# runner + shrinker
# ---------------------------------------------------------------------------


def compare(case: Case, spark, con, sf_dir: str) -> str | None:
    """None if Spark and DuckDB agree; else a problem description."""
    from tools.verify_local import canon_df

    try:
        df, sql = render(case, spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        return f"render raised {type(exc).__name__}: {exc}"
    try:
        sdf = df.toPandas()
    except Exception as exc:  # noqa: BLE001
        return f"spark raised {type(exc).__name__}: {exc}"
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as exc:  # noqa: BLE001
        return f"duckdb raised {type(exc).__name__}: {exc}"
    s_cols, _s_kinds, s_rows = canon_df(sdf)
    o_cols, _o_kinds, o_rows = canon_df(odf)
    if s_cols != o_cols:
        return f"cols spark={s_cols} duckdb={o_cols}"
    if len(s_rows) != len(o_rows):
        # KNOWN ENGINE DIVERGENCE (found by grammar-v2 seed 22, round
        # 12; verified by hand): GROUP BY ROLLUP/CUBE/GROUPING SETS
        # over an EMPTY input yields the standard's grand-total row(s)
        # in DuckDB (count 0, keys NULL) but ZERO rows in Spark —
        # Spark expands grouping sets via Expand BEFORE the aggregate,
        # so an empty child stays empty, while the standard treats the
        # () grouping set like an ungrouped aggregate.  Filed in
        # SURVEY §5.2; not a harness bug, and not fixable in a render
        # without changing what's being tested — so an empty-input
        # gsets case is recorded as agreeing-modulo-known-divergence.
        if case.kind == "gsets" and len(s_rows) == 0:
            base = _base_df(spark, sf_dir, case.spec.table)
            if case.spec.pred is not None:
                base = base.filter(case.spec.pred.sp)
            if base.limit(1).count() == 0:
                return None
        return f"rowcount spark={len(s_rows)} duckdb={len(o_rows)}"
    if s_rows != o_rows:
        i = next(i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b)
        return f"values differ at sorted row {i}: spark={s_rows[i]} duckdb={o_rows[i]}"
    return None


def _reductions(case: Case):
    """Query-level shrink candidates (drop one optional part)."""
    s = case.spec
    outs = []
    if case.kind == "twin_window":
        if s.pred is not None:
            outs.append(replace(s, pred=None))
        if s.keyed:
            outs.append(replace(s, keyed=False))
        if len(s.aggs) > 1:
            for i in range(len(s.aggs)):
                outs.append(replace(s, aggs=s.aggs[:i] + s.aggs[i + 1:]))
        if s.form == "sliding":
            outs.append(replace(s, form="tumbling"))
        return outs
    if case.kind == "ivljoin":
        if s.pa is not None:
            outs.append(replace(s, pa=None))
        if s.pb is not None:
            outs.append(replace(s, pb=None))
        if s.rel != "overlap":
            outs.append(replace(s, rel="overlap"))
        if s.cell_sec != 3600:
            outs.append(replace(s, cell_sec=3600))
        return outs
    if case.kind == "jsonpath":
        if s.pred is not None:
            outs.append(replace(s, pred=None))
        if len(s.derived) > 1:
            for i in range(1, len(s.derived)):
                outs.append(
                    replace(s, derived=s.derived[:i] + s.derived[i + 1:])
                )
        if s.form == "group":
            outs.append(replace(s, form="project", pred=None))
        return outs
    if case.kind == "setrollup":
        if s.p1 is not None:
            outs.append(replace(s, p1=None))
        if s.p2 is not None:
            outs.append(replace(s, p2=None))
        if s.op != "unionall":
            outs.append(replace(s, op="unionall"))
        if len(s.aggs) > 1:
            for i in range(len(s.aggs)):
                outs.append(replace(s, aggs=s.aggs[:i] + s.aggs[i + 1:]))
        if len(s.keys) > 1:
            for i in range(len(s.keys)):
                outs.append(replace(s, keys=s.keys[:i] + s.keys[i + 1:]))
        return outs
    if case.kind == "filter":
        if s.pred is not None:
            outs.append(replace(s, pred=None))
        if s.order_limit:
            outs.append(replace(s, order_limit=None))
        for i in range(len(s.derived)):
            outs.append(
                replace(s, derived=s.derived[:i] + s.derived[i + 1 :])
            )
        if len(s.out) > 1:
            for i in range(len(s.out)):
                outs.append(replace(s, out=s.out[:i] + s.out[i + 1 :]))
    elif case.kind == "agg":
        if s.pred is not None:
            outs.append(replace(s, pred=None))
        if s.having:
            outs.append(replace(s, having=None))
        for i in range(len(s.keys)):
            outs.append(replace(s, keys=s.keys[:i] + s.keys[i + 1 :]))
        if len(s.aggs) > 1:
            for i in range(len(s.aggs)):
                if s.having and s.aggs[i].alias == s.having[0]:
                    continue
                outs.append(replace(s, aggs=s.aggs[:i] + s.aggs[i + 1 :]))
    elif case.kind == "join":
        if s.lpred is not None:
            outs.append(replace(s, lpred=None))
        if s.rpred is not None:
            outs.append(replace(s, rpred=None))
        if s.group:
            outs.append(replace(s, group=None))
        if len(s.aggs) > 1:
            for i in range(len(s.aggs)):
                outs.append(replace(s, aggs=s.aggs[:i] + s.aggs[i + 1 :]))
    elif case.kind == "setop":
        if s.lpred is not None:
            outs.append(replace(s, lpred=None))
        if s.rpred is not None:
            outs.append(replace(s, rpred=None))
        if s.op != "union_all":
            outs.append(replace(s, op="union_all"))
        if len(s.out) > 1:
            for i in range(len(s.out)):
                outs.append(replace(s, out=s.out[:i] + s.out[i + 1 :]))
    elif case.kind == "agg2":
        if s.pred is not None:
            outs.append(replace(s, pred=None))
        if len(s.outer) > 1:
            for i in range(len(s.outer)):
                outs.append(replace(s, outer=s.outer[:i] + s.outer[i + 1 :]))
        referenced = {src for _, _, src in s.outer}
        if len(s.inner) > 1:
            for i in range(len(s.inner)):
                if s.inner[i].alias in referenced:
                    continue
                outs.append(replace(s, inner=s.inner[:i] + s.inner[i + 1 :]))
    elif case.kind == "join3":
        for f in ("p1", "p2", "p3"):
            if getattr(s, f) is not None:
                outs.append(replace(s, **{f: None}))
        if s.group:
            outs.append(replace(s, group=None))
        if s.how1 == "left":
            outs.append(replace(s, how1="inner"))
        if s.how2 == "left":
            outs.append(replace(s, how2="inner"))
        if len(s.aggs) > 1:
            for i in range(len(s.aggs)):
                outs.append(replace(s, aggs=s.aggs[:i] + s.aggs[i + 1 :]))
    elif case.kind == "subq":
        if s.opred is not None:
            outs.append(replace(s, opred=None))
        if s.ipred is not None:
            outs.append(replace(s, ipred=None))
        if len(s.out) > 1:
            for i in range(len(s.out)):
                outs.append(replace(s, out=s.out[:i] + s.out[i + 1 :]))
    elif case.kind == "gsets":
        if s.pred is not None:
            outs.append(replace(s, pred=None))
        if s.mode != "rollup":
            outs.append(replace(s, mode="rollup", sets=[]))
        if len(s.aggs) > 1:
            for i in range(len(s.aggs)):
                outs.append(replace(s, aggs=s.aggs[:i] + s.aggs[i + 1 :]))
    elif case.kind == "lambda":
        if s.pred is not None:
            outs.append(replace(s, pred=None))
        if len(s.shapes) > 1:
            for i in range(len(s.shapes)):
                outs.append(
                    replace(s, shapes=s.shapes[:i] + s.shapes[i + 1 :])
                )
    elif case.kind == "strfn":
        if s.pred is not None:
            outs.append(replace(s, pred=None))
        if len(s.derived) > 1:
            for i in range(len(s.derived)):
                outs.append(
                    replace(s, derived=s.derived[:i] + s.derived[i + 1 :])
                )
    elif case.kind == "rangewin":
        if s.pred is not None:
            outs.append(replace(s, pred=None))
        if len(s.funcs) > 1:
            for i in range(len(s.funcs)):
                outs.append(replace(s, funcs=s.funcs[:i] + s.funcs[i + 1 :]))
    elif case.kind == "winjoin":
        if s.lpred is not None:
            outs.append(replace(s, lpred=None))
        if s.rpred is not None:
            outs.append(replace(s, rpred=None))
        if s.how == "left":
            outs.append(replace(s, how="inner"))
        if len(s.funcs) > 1:
            for i in range(len(s.funcs)):
                outs.append(replace(s, funcs=s.funcs[:i] + s.funcs[i + 1 :]))
    elif case.kind == "lambda_join":
        if s.dpred is not None:
            outs.append(replace(s, dpred=None))
        if s.group:
            outs.append(replace(s, group=None))
        if len(s.shapes) > 1:
            for i in range(len(s.shapes)):
                outs.append(
                    replace(s, shapes=s.shapes[:i] + s.shapes[i + 1 :])
                )
    else:
        if s.pred is not None:
            outs.append(replace(s, pred=None))
        if len(s.funcs) > 1:
            for i in range(len(s.funcs)):
                outs.append(replace(s, funcs=s.funcs[:i] + s.funcs[i + 1 :]))
    return [Case(case.seed, case.kind, o) for o in outs]


def shrink(case: Case, spark, con, sf_dir: str, problem: str) -> Case:
    """Greedy reduction: keep applying any single drop that still
    reproduces A divergence (not necessarily the same string)."""
    cur = case
    changed = True
    while changed:
        changed = False
        for cand in _reductions(cur):
            if compare(cand, spark, con, sf_dir) is not None:
                cur = cand
                changed = True
                break
    return cur


def run(
    n: int = 500,
    seed0: int = 0,
    sf_dir: str = "/root/testdata/sf0.001",
    stop_on_fail: bool = False,
    spark=None,
    progress_every: int = 100,
    grammar: str = "v1",
) -> list[tuple[int, str]]:
    """Run n seeded cases; returns [(seed, problem)] for divergences."""
    import duckdb

    from skyhookdb_ceph_spark.catalog import TABLES
    from skyhookdb_ceph_spark.session import get_spark

    if spark is None:
        spark = get_spark(app_name="fuzz_differential", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    gen = {"v2": gen_case2, "v3": gen_case3}.get(grammar, gen_case)
    failures = []
    for seed in range(seed0, seed0 + n):
        case = gen(seed)
        problem = compare(case, spark, con, sf_dir)
        if problem is not None:
            small = shrink(case, spark, con, sf_dir, problem)
            sproblem = compare(small, spark, con, sf_dir)
            _df, ssql = (None, "<render failed>")
            try:
                _df, ssql = render(small, spark, sf_dir)
            except Exception:  # noqa: BLE001
                pass
            out_dir = Path(__file__).parent / "fuzz_failures"
            out_dir.mkdir(exist_ok=True)
            repro = {
                "seed": seed,
                "kind": case.kind,
                "problem": problem,
                "shrunk_problem": sproblem,
                "shrunk_sql": ssql,
            }
            (out_dir / f"seed_{seed}.json").write_text(
                json.dumps(repro, indent=2)
            )
            print(f"DIVERGE seed={seed} [{case.kind}] {problem}")
            print(f"  shrunk: {sproblem}\n  sql: {ssql}")
            failures.append((seed, problem))
            if stop_on_fail:
                break
        elif progress_every and (seed - seed0 + 1) % progress_every == 0:
            print(f"... {seed - seed0 + 1}/{n} green")
    return failures


def main() -> int:
    args = sys.argv[1:]
    n, seed0, sf_dir, stop = 500, 0, "/root/testdata/sf0.001", False
    grammar = "v1"
    it = iter(args)
    for a in it:
        if a == "--n":
            n = int(next(it))
        elif a == "--seed0":
            seed0 = int(next(it))
        elif a == "--sf":
            sf_dir = next(it)
        elif a == "--stop-on-fail":
            stop = True
        elif a == "--grammar":
            grammar = next(it)
    failures = run(n, seed0, sf_dir, stop, grammar=grammar)
    print(f"\n{n - len(failures)}/{n} agree [{grammar}]")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
