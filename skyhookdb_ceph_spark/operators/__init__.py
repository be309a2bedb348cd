"""Reusable operator library (custom ops Spark lacks as built-ins).

Each module implements one family as compositions of DataFrame
operations — no driver-side loops, no row-at-a-time Python UDFs:

- minhash.py    — shingling + banded MinHash LSH (fuzzy dedup)
- simhash.py    — SimHash bit-signature clustering
- vectors.py    — cosine/dot expressions + sign-bucket LSH for ANN
- text_index.py — inverted text index (reference IDX_TXT analog)
- asof.py       — as-of (nearest-timestamp) join
- range_join.py — bucketed band/theta join (no nested-loop)
- multimodal.py — opaque-binary columns + Arrow-batched decode plumbing
- layout.py     — partitioned/sorted Parquet writer (IDX_REC analog)
"""
