#!/usr/bin/env python
"""Benchmark harness: times every registered query on one shared
SparkSession and prints ONE JSON line (the driver's BENCH_r{N} record).

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Methodology mirrors BASELINE.md §C (DuckDB baseline): one warm run,
then best-of-2 timed runs — except the 13 HEADLINE gate queries, which
are MEDIAN-of-3 with the per-rep samples and spread recorded in the
gate object (single-number gating sat inside a ±15% noise box, §G).
Full materialization included (Arrow collect — the analog of DuckDB's
fetchall).  JVM/session startup is excluded from per-query numbers but
reported separately as "startup_sec".
Queries tagged "live-stream" (true readStream micro-pipelines) get the
same warm run (absorbing one-time stream-machinery init), then a single
timed drain of the full micro-pipeline.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from skyhookdb_ceph_spark.registry import load_all  # noqa: E402
from skyhookdb_ceph_spark.session import get_spark  # noqa: E402


def _materialize(df) -> int:
    """Pull the full result to the driver; returns rowcount.

    Materialization = every result value resident driver-side, as
    Arrow record batches — the engine's native interchange format and
    the analog of the DuckDB baseline's fetchall() (which materializes
    to Python tuples).  The earlier toPandas() form added ~0.8 s of
    pandas-block construction on full-table results (measured
    q_scan_full sf0.1: 1.48 s toPandas vs 0.63 s Arrow) that is
    client-library conversion cost, not engine cost."""
    batches = df._collect_as_arrow()  # noqa: SLF001
    return sum(b.num_rows for b in batches)


# BASELINE.md §A headline queries — the judge's 2x comparison set —
# with the DuckDB 1.0.0 sf0.1 baseline (ms) measured in BASELINE.md §C.
# The baseline is an IN-PROCESS library call (no scheduler, no IPC);
# every Spark query pays the measured per-query dispatch floor
# (floor_sec: py4j + job scheduling + Arrow collect) regardless of plan
# quality, and that floor vanishes at cluster scale where a query's
# data time is minutes, not milliseconds.  The gate evaluation the
# record carries is therefore floor-NET per query: queries whose
# baseline exceeds the floor (data-dominated: scan_full, filter_gt,
# topk) must be within 2x of DuckDB; queries whose baseline is BELOW
# the floor (sub-40 ms: the floor itself exceeds the entire DuckDB
# runtime) can never meet a raw 2x at any plan quality and are
# reported as floor-dominated with their net overhead visible.
def load_headline_baselines() -> dict[str, float]:
    """Parse the measured DuckDB table out of BASELINE.md §A — the
    single source of truth for the gate comparison (r6 ADVICE #2:
    inline literals in this file could silently drift from the
    documented baseline; now they cannot).  tests/test_bench_gate.py
    asserts the parse yields exactly the documented headline set."""
    import re

    text = (Path(_REPO) / "BASELINE.md").read_text()
    sect = text.split("## A.", 1)[1].split("\n## ", 1)[0]
    return {
        m.group(1): float(m.group(2))
        for m in re.finditer(r"^\| (q_\w+)[^|]*\| ([0-9.]+) ms ", sect, re.M)
    }


HEADLINE_BASELINE_MS = load_headline_baselines()
HEADLINE = set(HEADLINE_BASELINE_MS)

# Queries AUDITED to contain an intentional global (unpartitioned)
# window over a bounded input — a per-bucket sort of ~0.1% of rows
# (median_exact), a supplier-count aggregate (gini/skyline), a
# cross-block carry of one row per day (win_gaps), a dimension-bounded
# rank (ntile/islands/histogram/bm25/zipf/vocab_pairs).  Every run
# counts windowspecdefinition specs with an empty partition clause in
# each query's optimized plan (plans/explain.py); any query OUTSIDE
# this list with a global window lands in the record's
# "unpartitioned_windows" object so a NEW single-task sort is visible
# instead of buried in the WARN log tail (r5 verdict item 5).
# tests/test_bench_gate.py re-audits the full registry against this
# list.
WINDOW_ALLOWLIST = {
    "q_agg_gini",
    "q_agg_median_exact",
    "q_agg_skyline",
    "q_fn_histogram",
    "q_text_bm25",
    "q_text_rerank",  # rank over 10 rows post-limit (bm25 precedent)
    "q_text_hybrid_rrf",  # leg ranks over 50 rows post-TakeOrdered +
    # fusion rank over <=100 fused rows — all shortlist-bounded
    "q_text_zipf",
    "q_stats_ks_drift",  # bucket-offset carry over ~120 SUMMARY rows
    "q_vocab_pairs",
    "q_win_gaps",
    "q_win_islands",
    "q_win_ntile_pct",
}


def build_gate(
    headline_times: dict[str, float],
    headline_samples: dict[str, list[float]],
    floor: float,
) -> dict[str, dict]:
    """Per-query gate evaluation vs the DuckDB baseline (parsed from
    BASELINE.md §A).  raw_ratio = t / baseline unadjusted; net_ratio
    subtracts the self-measured local-mode dispatch floor.  t is the
    MEDIAN of samples_sec (sorted, 3 reps — r7 verdict item 2:
    best-of-2 sat inside a ±15% noise box where phantom swings were as
    large as real fixes); spread_sec = max - min makes a noisy median
    visible as such.  "data" queries (baseline > floor) are the ones a
    plan can win or lose; "floor" queries' entire baseline is smaller
    than one Spark job dispatch."""
    gate = {}
    for name, t in headline_times.items():
        base_s = HEADLINE_BASELINE_MS[name] / 1e3
        samples = headline_samples.get(name, [t])
        gate[name] = {
            "baseline_ms": HEADLINE_BASELINE_MS[name],
            "raw_ratio": round(t / base_s, 2),
            "net_ratio": round(max(t - floor, 0.0) / base_s, 2),
            "kind": "data" if base_s > floor else "floor",
            "samples_sec": [round(s, 4) for s in samples],
            "spread_sec": round(max(samples) - min(samples), 4),
        }
    return gate


def box_state() -> dict:
    """Co-tenancy self-audit at gate start (r10 verdict item 7 —
    §K.1 showed an overlapping pytest run silently 7×'d a headline
    scan).  Two independent signals: /proc/loadavg (what ELSE the box
    is running) and a short single-thread busy-spin calibration (how
    fast THIS process actually executes right now — contention shows
    up as a lower rate even when loadavg lags)."""
    try:
        with open("/proc/loadavg") as f:
            load = [float(x) for x in f.read().split()[:3]]
    except OSError:
        load = [-1.0, -1.0, -1.0]
    t_end = time.perf_counter() + 0.5
    ops = 0
    x = 1.0001
    while time.perf_counter() < t_end:
        for _ in range(10000):
            x = (x * 1.0000001) % 2.0
        ops += 10000
    return {
        "loadavg": load,
        "ncpu": os.cpu_count() or 1,
        "spin_mops": round(ops / 0.5 / 1e6, 2),
    }


QUIET_SPIN_FILE = Path(__file__).resolve().parent / "tools" / "quiet_spin.json"
SPIN_REFUSAL_FRACTION = 0.85  # refuse below 0.85x the quiet-box rate


def load_quiet_spin() -> dict | None:
    """Stored quiet-box spin calibration (tools/quiet_spin.json,
    written by `python bench.py --calibrate-spin` on a verified-quiet
    box).  Returns None when absent — the spin check then degrades to
    loadavg-only rather than refusing on a reference this machine
    never established."""
    try:
        with open(QUIET_SPIN_FILE) as f:
            cal = json.load(f)
        return cal if isinstance(cal.get("spin_mops"), (int, float)) else None
    except (OSError, ValueError):
        return None


def certify_gate(box: dict, quiet_cal: dict | None = None) -> tuple[bool, str | None]:
    """Refusal rule (documented in BASELINE.md §L.3): a headline gate
    run is certified only when, at bench start, BOTH
    (1) the 1-minute loadavg is below a quarter of the cores (floor
        2.0) — what ELSE the box is running, and
    (2) the busy-spin calibration is within 0.85x of the stored
        quiet-box rate (tools/quiet_spin.json) — how fast THIS process
        actually executes right now.  §L.3 named low spin_mops as "the
        co-tenancy tell" precisely because loadavg lags and can be
        sampled after the co-tenant exits; BENCH_r11 certified a run
        whose spin sat 23% low and whose dispatch floor DOUBLED, which
        is what this check exists to refuse.
    Above either limit, the record still ships — the driver needs its
    JSON — but carries gate_certified=false so nobody re-baselines on
    a co-tenant-noised number (the §K.1 failure mode)."""
    limit = max(2.0, 0.25 * box["ncpu"])
    load1 = box["loadavg"][0]
    if load1 > limit:  # load1 < 0 (no /proc) never exceeds the limit
        return (
            False,
            f"loadavg1={load1} > {limit:.1f} (0.25*ncpu): co-tenant "
            "load at gate start; rerun on a quiet box before "
            "comparing headline numbers (BASELINE.md §K.1/§L.3)",
        )
    if quiet_cal is not None:
        floor_mops = SPIN_REFUSAL_FRACTION * quiet_cal["spin_mops"]
        if box["spin_mops"] < floor_mops:
            return (
                False,
                f"spin_mops={box['spin_mops']} < {floor_mops:.1f} "
                f"(0.85x quiet-box {quiet_cal['spin_mops']}): this "
                "process is executing materially slower than the "
                "stored quiet-box calibration — the co-tenancy tell "
                "even when loadavg looks clean (BASELINE.md §L.3); "
                "rerun on a quiet box or recalibrate with "
                "`python bench.py --calibrate-spin` if the hardware "
                "changed",
            )
    return True, None


def calibrate_spin() -> int:
    """`python bench.py --calibrate-spin`: store the quiet-box spin
    reference.  Takes best-of-5 spins (max, not median — any co-tenant
    only ever LOWERS the rate, so the max is the cleanest estimate of
    the uncontended rate) and refuses to write at all when loadavg
    says the box is not quiet enough to calibrate on."""
    box = box_state()
    limit = max(2.0, 0.25 * box["ncpu"])
    if box["loadavg"][0] > limit:
        print(
            f"refusing to calibrate: loadavg1={box['loadavg'][0]} > "
            f"{limit:.1f} — a calibration taken on a loaded box would "
            "make the gate blind to exactly the contention it exists "
            "to catch",
            file=sys.stderr,
        )
        return 1
    spins = [box_state()["spin_mops"] for _ in range(5)]
    cal = {
        "spin_mops": max(spins),
        "samples": spins,
        "loadavg1_at_calibration": box["loadavg"][0],
        "ncpu": box["ncpu"],
        "note": "quiet-box single-thread busy-spin rate; gate refuses "
        "below 0.85x this (BASELINE.md §L.3)",
    }
    QUIET_SPIN_FILE.parent.mkdir(parents=True, exist_ok=True)
    with open(QUIET_SPIN_FILE, "w") as f:
        json.dump(cal, f, indent=1)
    print(json.dumps(cal))
    return 0


GATE_WAIT_DELAYS = (5.0, 10.0, 20.0, 40.0, 75.0)  # ~2.5 min budget


def await_quiet_box(
    quiet_cal: dict | None,
    delays: tuple[float, ...] = GATE_WAIT_DELAYS,
    sleep=time.sleep,
    sample=None,
) -> tuple[dict, bool, str | None]:
    """Sample box state; on a gate refusal, wait with backoff and
    re-sample until certified or the delay budget runs out — the
    bounded spin-gated wait of r12 verdict item 2, extending the r11
    single 5-second rerun that proved too short (BENCH_r12's both
    samples landed inside one co-tenant burst 5 s apart).  A
    transient co-tenant — a cron tick, another session's pytest
    teardown, a page-cache flush — usually clears within a couple of
    minutes; a persistent one fails every attempt and the record
    ships uncertified with EVERY sample visible under `attempts`.
    The gate never certifies anything it didn't measure quiet: each
    attempt is a full loadavg+spin re-measure, never a discount.

    `sleep` / `sample` are injectable for the unit test
    (tests/test_bench_gate.py) — production callers use the real
    clock and box_state."""
    sample = sample or box_state
    box = sample()
    certified, refusal = certify_gate(box, quiet_cal)
    if certified:
        return box, True, None
    attempts = [{k: box[k] for k in ("loadavg", "spin_mops")}]
    for delay in delays:
        sleep(delay)
        box_i = sample()
        cert_i, refusal_i = certify_gate(box_i, quiet_cal)
        attempts.append({k: box_i[k] for k in ("loadavg", "spin_mops")})
        if cert_i:
            box = {**box_i, "first_attempt": attempts[0]}
            certified, refusal = True, None
            break
        box, refusal = box_i, refusal_i
    box = dict(box)
    box["attempts"] = attempts
    return box, certified, refusal


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = None

    quiet_cal = load_quiet_spin()
    box, certified, refusal = await_quiet_box(quiet_cal)

    t0 = time.perf_counter()
    # Small-data profile: AQE's per-stage materialization + re-planning
    # costs 30-50% on sub-second queries (measured: q_agg_scalar 322ms
    # -> 177ms) and only pays off on multi-GB shuffles.  The engine
    # default keeps AQE ON (session.py — coalescing + skew-join are the
    # 100 TB levers); the bench measures the interactive small-data
    # profile, like the DuckDB baseline it is compared against.
    # Correctness (tools/verify_local.py, tests/) runs AQE-on.
    # Without AQE's runtime coalescing, the static shuffle partition
    # count matters: 8 measured best at sf0.1 (32 pays scheduling
    # overhead per tiny shuffle task).
    # CBO off here for the same reason AQE is: without ANALYZE'd table
    # stats (none exist for raw parquet fixtures) cost-based reordering
    # can't improve any plan, but its stats plumbing adds measurable
    # per-statement planning time.  session.py keeps it on — with real
    # catalog stats at cluster scale it's a win.
    # Retry-less bench session (local[N,1]): a silent second task
    # attempt would hide first-attempt failures inside a timing number
    # (r6 verdict item 7).  The engine default stays local[N,2]
    # (session.py); the fault queries degrade to clean runs here by
    # design.
    os.environ.setdefault("SPARK_GRAFT_TASK_ATTEMPTS", "1")
    spark = get_spark(
        app_name="skyhook_bench",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8")),
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.cbo.enabled": "false",
        },
    )
    spark.range(1).collect()  # force JVM + first-job init
    startup = time.perf_counter() - t0

    # Per-query dispatch floor on THIS box right now: a warmed 1-row
    # job through the same materialization path (py4j + scheduling +
    # Arrow).  Every query pays it regardless of data size, and it
    # swings 1.3-1.5x with machine state across sessions (BASELINE.md
    # §E) — reporting it makes records comparable across rounds:
    # plan-attributable time ~= value - n_queries * floor_sec.
    _materialize(spark.range(1))
    floor = float("inf")
    for _ in range(3):
        t = time.perf_counter()
        _materialize(spark.range(1))
        floor = min(floor, time.perf_counter() - t)

    from skyhookdb_ceph_spark.plans.explain import count_unpartitioned_windows

    specs = load_all()
    times: dict[str, float] = {}
    headline_samples: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    win_global: dict[str, int] = {}
    for name, spec in sorted(specs.items()):
        # Single timed run for true streams (each drain re-runs the
        # full micro-pipeline) and for iterative fixpoints (graph
        # queries run N convergence rounds with a driver-side check
        # per round — deterministic, and best-of-2 would double a
        # multi-job loop for no noise reduction).
        live = "live-stream" in spec.tags or "iterative" in spec.tags
        try:
            # Warm run for everything (plan + code paths; mirrors the
            # DuckDB baseline's warm-run protocol).  For live streams
            # the warm run also absorbs the ONE-TIME stream-machinery
            # init (state store registry, streaming listener, first
            # checkpoint) — without it the first stream query measured
            # ~3 s of session-global setup as its own cost.
            warm_df = spec.fn(spark, sf_dir)
            _materialize(warm_df)
            if not live:
                # plan already analyzed by the warm run — string scan
                # only, no job (live streams build fresh pipelines per
                # call; their plan inspection is skipped by design)
                try:
                    n_gw = count_unpartitioned_windows(warm_df)
                    if n_gw:
                        win_global[name] = n_gw
                except Exception:  # noqa: BLE001 — diagnostics only
                    pass
            # Best-of-2 for ordinary batch queries: single timed runs
            # showed up to 4x GC/scheduling noise on mid-weight
            # queries, which the per-round BENCH comparison would
            # misread as regressions.  HEADLINE queries — the judge's
            # gate population — get MEDIAN-of-3 instead: best-of-2
            # still left ±15% single-run swings (BASELINE.md §G —
            # r7 saw ±100 ms phantom moves on q_scan_full/q_sim_knn
            # as large as that round's real fixes), and the median
            # both resists one slow outlier AND doesn't reward one
            # lucky cache-hot run the way min does.  The gate records
            # the spread so a noisy median is visible as such.  Live
            # streams stay single-timed-run (each drain re-runs the
            # full micro-pipeline, deterministic).
            reps = 1 if live else (3 if name in HEADLINE else 2)
            samples = []
            for _ in range(reps):
                t = time.perf_counter()
                _materialize(spec.fn(spark, sf_dir))
                samples.append(time.perf_counter() - t)
            samples.sort()
            if name in HEADLINE:
                times[name] = round(samples[len(samples) // 2], 4)
                headline_samples[name] = [round(s, 4) for s in samples]
            else:
                times[name] = round(samples[0], 4)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        finally:
            # Session hygiene between queries: operators that persist()
            # an intermediate (shingle sets, embeddings) never unpersist
            # — each fn() call builds a NEW plan, so reps never reuse a
            # cache entry (timing is honest), but the entries ACCUMULATE
            # across the 300+-query session and tax later queries'
            # GC/memory (measured at 100x fixture rows: a late query ran
            # 45% slower in a stale session than fresh — BASELINE.md
            # §L.6's 311.7 -> 213.7 s re-investigation).
            try:
                spark.catalog.clearCache()
            except Exception:  # noqa: BLE001 — hygiene must not fail a run
                pass

    total = round(sum(times.values()), 4)
    headline_times = {k: times[k] for k in sorted(HEADLINE) if k in times}
    full_record = {
        "metric": "sum_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "startup_sec": round(startup, 2),
        "floor_sec": round(floor, 4),
        "n_queries": len(times),
        "aqe_off": True,  # bench profile; correctness gate runs AQE-on
        "global_windows_all": win_global,  # incl. allowlisted (audit)
        "headline_samples": headline_samples,  # sorted; median gated
        "box_state": box,
        "gate_certified": certified,
    }
    if errors:
        full_record["errors"] = errors
    side = Path(_REPO) / ".benchmarks" / "bench_full.json"
    side.parent.mkdir(exist_ok=True)
    side.write_text(json.dumps(full_record, indent=1))
    # Round-stamped archive so cross-round per-query diffs survive the
    # next run's overwrite (r13 verdict item 7).  The current round is
    # max(existing BENCH_r*.json) + 1: the driver writes BENCH_r{N} at
    # round close, so while round N runs only r1..N-1 exist on disk.
    import re as _re

    _env_tag = os.environ.get("SPARK_GRAFT_BENCH_ROUND")
    _tag = None
    if _env_tag:
        # Validate instead of a bare int(): a malformed override (e.g.
        # 'r15') would otherwise raise AFTER the whole bench ran,
        # losing the archive the override was meant to control (r15
        # ADVICE).  Fall back to the glob inference with a warning.
        if _re.fullmatch(r"\d+", _env_tag.strip()):
            _tag = int(_env_tag)
        else:
            print(
                f"[bench] ignoring malformed SPARK_GRAFT_BENCH_ROUND="
                f"{_env_tag!r} (want digits); inferring from BENCH_r* "
                "files instead",
                file=sys.stderr,
            )
    if _tag is None:
        _rounds = [
            int(m.group(1))
            for p in Path(_REPO).glob("BENCH_r*.json")
            if (m := _re.match(r"BENCH_r(\d+)\.json$", p.name))
        ]
        _tag = (max(_rounds) + 1) if _rounds else 1
        # The heuristic mislabels in a fresh checkout (BENCH_r* are
        # driver-written) or an out-of-round run; log it so a wrong
        # tag is visible rather than silent (r14 ADVICE).  stderr —
        # stdout stays the one-JSON-line contract.
        print(
            f"[bench] archive round tag inferred as r{_tag:02d} "
            "(override with SPARK_GRAFT_BENCH_ROUND)",
            file=sys.stderr,
        )
    (side.parent / f"bench_full_r{_tag:02d}.json").write_text(
        json.dumps(full_record, indent=1)
    )

    # The driver captures only a ~4 KB tail of stdout and parses the
    # final JSON line (BENCH_r{1,2} both came back "parsed": null when
    # this line carried the full 110-query map).  Keep the last line
    # compact: totals + the BASELINE.md §A headline subset only; the
    # full per-query map lives in .benchmarks/bench_full.json.
    record = {
        "metric": "sum_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": headline_times,
        "headline_sum_sec": round(sum(headline_times.values()), 4),
        # Plan-attributable headline time: every query pays the ~0.1 s
        # local-mode dispatch floor (py4j + scheduling + Arrow, see
        # BASELINE.md §E) regardless of plan quality; the floor-net sum
        # is the number comparable against the in-process DuckDB
        # baseline's per-query times.
        "headline_floor_net_sec": round(
            sum(max(v - floor, 0.0) for v in headline_times.values()), 4
        ),
        # Per-query gate evaluation vs the DuckDB baseline (parsed
        # from BASELINE.md §A): raw_ratio = t / baseline is the
        # unadjusted number; net_ratio = (t - floor) / baseline
        # subtracts the SELF-MEASURED local-mode dispatch floor (see
        # floor_sec — re-measured every run, swings 1.3-2.5x with
        # machine state, so net ratios are comparable only through the
        # floor_sec they carry).  "data" queries (baseline > floor)
        # are the ones a plan can win or lose; "floor" queries' entire
        # baseline is smaller than one Spark job dispatch.
        "gate": build_gate(headline_times, headline_samples, floor),
        "gate_stat": "median_of_3",
        "gate_floor_self_measured": True,
        # co-tenancy self-audit: loadavg + busy-spin calibration at
        # gate start; certified=false means the headline numbers are
        # NOT comparable across rounds (box was loaded — §K.1)
        "box_state": box,
        "gate_certified": certified,
        **({"gate_refusal_reason": refusal} if refusal else {}),
        "sf": sf,
        "startup_sec": round(startup, 2),
        "floor_sec": round(floor, 4),
        "n_queries": len(times),
        "n_errors": len(errors),
        # UNEXPECTED single-task global windows only (audited bounded
        # ones live in WINDOW_ALLOWLIST; full counts in full_record) —
        # normally {}: any entry here is a new scale-killer to fix.
        "unpartitioned_windows": {
            k: v for k, v in win_global.items() if k not in WINDOW_ALLOWLIST
        },
        "full_record": str(side),
    }
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    if "--calibrate-spin" in sys.argv[1:]:
        sys.exit(calibrate_spin())
    sys.exit(main())
