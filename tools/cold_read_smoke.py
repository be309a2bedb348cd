#!/usr/bin/env python
"""Cold-cache IO datapoint (VERDICT r8 item 8).

Every other measurement in BASELINE.md ran with fixtures in page
cache, so the scan numbers exercise CPU + decode, not IO.  This tool
evicts the target parquet's pages with posix_fadvise(DONTNEED)
(file-targeted — no system-wide cache drop), runs the query cold,
then re-runs warm, for q_scan_full and q_tpch_q1 at the given SF dir.

    python tools/cold_read_smoke.py [/root/repo/.scratch/scale/sf1]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from skyhookdb_ceph_spark.registry import load_all  # noqa: E402
from skyhookdb_ceph_spark.session import get_spark  # noqa: E402


def evict(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)  # flush any dirty pages first so DONTNEED drops them
        os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
    finally:
        os.close(fd)


def cached_bytes(path: str) -> int:
    """Resident page-cache bytes for the file via raw mmap + mincore."""
    import ctypes
    import mmap

    size = os.path.getsize(path)
    if size == 0:
        return 0
    libc = ctypes.CDLL("libc.so.6", use_errno=True)
    libc.mmap.restype = ctypes.c_void_p
    libc.mmap.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_long,
    ]
    PROT_READ, MAP_SHARED = 0x1, 0x01
    fd = os.open(path, os.O_RDONLY)
    try:
        addr = libc.mmap(None, size, PROT_READ, MAP_SHARED, fd, 0)
        if addr in (None, ctypes.c_void_p(-1).value):
            return -1
        try:
            pages = (size + mmap.PAGESIZE - 1) // mmap.PAGESIZE
            vec = (ctypes.c_ubyte * pages)()
            rc = libc.mincore(
                ctypes.c_void_p(addr), ctypes.c_size_t(size), vec
            )
            if rc != 0:
                return -1
            return sum(1 for b in vec if b & 1) * mmap.PAGESIZE
        finally:
            libc.munmap(ctypes.c_void_p(addr), ctypes.c_size_t(size))
    finally:
        os.close(fd)


def mat(df):
    return sum(b.num_rows for b in df._collect_as_arrow())  # noqa: SLF001


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/scale/sf1"
    lineitem = f"{sf}/lineitem.parquet"
    spark = get_spark(app_name="cold_read", shuffle_partitions=32)
    spark.range(1).collect()
    specs = load_all()
    out = {"sf_dir": sf, "lineitem_mb": round(
        os.path.getsize(lineitem) / 1e6, 1)}
    for qname in ("q_scan_full", "q_tpch_q1"):
        fn = specs[qname].fn
        mat(fn(spark, sf))  # warm code paths AND page cache first
        warm = []
        for _ in range(3):
            t = time.perf_counter()
            mat(fn(spark, sf))
            warm.append(time.perf_counter() - t)
        cold = []
        for _ in range(3):
            evict(lineitem)
            resident = cached_bytes(lineitem)
            t = time.perf_counter()
            mat(fn(spark, sf))
            cold.append(time.perf_counter() - t)
        out[qname] = {
            "resident_mb_after_evict": round(max(resident, 0) / 1e6, 2),
            "cold_s": [round(x, 2) for x in cold],
            "warm_s": [round(x, 2) for x in warm],
            "cold_median_s": round(statistics.median(cold), 2),
            "warm_median_s": round(statistics.median(warm), 2),
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
