#!/usr/bin/env python
"""One-off generator for the sf0.3/sf1 SCALING SMOKE (r7 verdict
item 9): inflate the sf0.1 fixture by an integer factor k while
preserving each table's distributional shape, so wall-time-vs-rows is
a fair linearity probe for the scale-design flagships.

    python tools/gen_scale.py 3  /root/repo/.scratch/scale/sf0.3
    python tools/gen_scale.py 10 /root/repo/.scratch/scale/sf1

Copy 0 is the original; copies 1..k-1 are deterministic perturbations
(numpy PCG64 seeded per (table, copy) — reproducible):

- events: new id/user populations per copy (disjoint offsets), ±3 s
  ts jitter, ±5 % value jitter — same 5 event types over the same
  time span, so per-hour density grows k× (how a k×-bigger deployment
  actually looks for the trailing-hour / peak-concurrency windows).
- lineitem: disjoint order/part/supp key ranges per copy — the
  (partkey, suppkey) co-occurrence graph gains k disjoint replicas:
  component-size distribution constant, edge count k× (the honest
  linearity shape for the min-label fixpoint).
- documents: per-copy token substitution (every 5th word replaced by
  a copy-tagged token) — WITHIN-copy near-duplicate structure is
  preserved (same positions substituted for every doc of a copy),
  while cross-copy shingle Jaccard collapses below the dedup
  threshold, so duplicate-pair count scales k×, not k².
- embeddings: v' = 0.8 v + 0.6 σ g (g standard normal per copy) —
  component scale preserved, cross-copy cosine decorrelated, so LSH
  bucket occupancy and candidate-pair counts stay ~linear in corpus.

Small dims (region nation customer supplier part orders) are copied
verbatim — the smoke's flagships don't scan them k× anyway.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
VERBATIM = ["region", "nation", "customer", "supplier", "part", "orders"]


def _rng(table: str, c: int) -> np.random.Generator:
    # zlib.crc32 is stable across interpreters — Python's hash() is
    # salted per process and would make the fixtures irreproducible
    import zlib

    return np.random.default_rng(zlib.crc32(f"{table}:{c}".encode()))


def scale_events(t: pa.Table, k: int) -> pa.Table:
    parts = [t]
    ts = t["ts"].to_numpy(zero_copy_only=False)
    for c in range(1, k):
        r = _rng("events", c)
        n = len(t)
        jitter = r.integers(-3, 4, n).astype("timedelta64[s]")
        parts.append(
            pa.table(
                {
                    "event_id": pa.array(
                        t["event_id"].to_numpy() + c * 10**9
                    ),
                    "ts": pa.array(ts + jitter, type=t.schema.field("ts").type),
                    "user_id": pa.array(t["user_id"].to_numpy() + c * 10**7),
                    "event_type": t["event_type"],
                    "value": pa.array(
                        t["value"].to_numpy() * (1 + (r.random(n) - 0.5) / 10)
                    ),
                    "props": t["props"],
                }
            )
        )
    return pa.concat_tables(parts)


def scale_lineitem(t: pa.Table, k: int) -> pa.Table:
    parts = [t]
    for c in range(1, k):
        d = {name: t[name] for name in t.schema.names}
        d["l_orderkey"] = pa.array(t["l_orderkey"].to_numpy() + c * 10**9)
        d["l_partkey"] = pa.array(t["l_partkey"].to_numpy() + c * 10**7)
        d["l_suppkey"] = pa.array(t["l_suppkey"].to_numpy() + c * 10**6)
        parts.append(pa.table(d))
    return pa.concat_tables(parts)


def scale_documents(t: pa.Table, k: int) -> pa.Table:
    parts = [t]
    texts = t["text"].to_pylist()
    for c in range(1, k):
        new_texts = []
        for txt in texts:
            words = txt.split(" ")
            for i in range(0, len(words), 5):
                words[i] = f"zq{c}x{i % 13}"
            new_texts.append(" ".join(words))
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(t["doc_id"].to_numpy() + c * 10**9),
                    "text": pa.array(new_texts),
                    "lang": t["lang"],
                    "source": t["source"],
                    "n_chars": pa.array(
                        np.array([len(s) for s in new_texts], dtype="int64")
                    ),
                }
            )
        )
    return pa.concat_tables(parts)


def scale_embeddings(t: pa.Table, k: int) -> pa.Table:
    parts = [t]
    emb = np.array(t["embedding"].to_pylist(), dtype="float32")
    sigma = float(emb.std())
    dim = emb.shape[1]
    for c in range(1, k):
        r = _rng("embeddings", c)
        noise = r.standard_normal(emb.shape).astype("float32") * sigma
        mixed = 0.8 * emb + 0.6 * noise
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(t["vec_id"].to_numpy() + c * 10**9),
                    "embedding": pa.array(
                        [row for row in mixed.tolist()],
                        type=pa.list_(pa.float32()),
                    ),
                    "label": t["label"],
                }
            )
        )
    out = pa.concat_tables(parts)
    assert len(out) == k * len(t), (len(out), k, len(t), dim)
    return out


def main() -> int:
    k = int(sys.argv[1])
    out = Path(sys.argv[2])
    # Validate the embedding width BEFORE writing anything: the
    # engine's DuckDB oracle twins fix dim=64 (vectors.dot_duckdb), so
    # a reshaped fixture must fail loudly here, not mid-generation or
    # — worse — downstream with plausible-but-wrong oracle data.
    emb0 = pq.read_table(SRC / "embeddings.parquet", columns=["embedding"])
    dim = len(emb0["embedding"][0])
    if dim != 64:
        raise SystemExit(
            f"embeddings dim {dim} != 64 — the DuckDB oracle twins "
            "(vectors.dot_duckdb) fix dim=64; update them before "
            "scaling this fixture"
        )
    out.mkdir(parents=True, exist_ok=True)
    for name in VERBATIM:
        shutil.copy(SRC / f"{name}.parquet", out / f"{name}.parquet")
    for name, fn in (
        ("events", scale_events),
        ("lineitem", scale_lineitem),
        ("documents", scale_documents),
        ("embeddings", scale_embeddings),
    ):
        t = pq.read_table(SRC / f"{name}.parquet")
        scaled = fn(t, k)
        pq.write_table(scaled, out / f"{name}.parquet")
        print(f"{name}: {len(t)} -> {len(scaled)} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
