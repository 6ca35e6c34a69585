"""Measure the reference zlib-ng (built at .ref_build/libz.so) on the bench
corpus: compress/decompress throughput + sizes at levels 1/6/9.

Writes BASELINE_MEASURED.json at the repo root. The reference publishes no
GB/s numbers (BASELINE.md), so this measured run *is* the baseline.
"""
from __future__ import annotations

import ctypes
import json
import os
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(ROOT, ".ref_build", "libz.so")


def load_corpus(target_mb: float = 8.0) -> bytes:
    """Mixed corpus from the reference's data files (Silesia stand-in:
    text + pdf + jpg mix), repeated to ~target_mb."""
    parts = []
    for p in (
        "/root/reference/test/data/lcet10.txt",
        "/root/reference/test/data/paper-100k.pdf",
        "/root/reference/test/data/fireworks.jpg",
        "/root/reference/doc/rfc1951.txt",
        "/root/reference/doc/rfc1952.txt",
    ):
        if os.path.exists(p):
            parts.append(open(p, "rb").read())
    if not parts:  # fallback: synthetic mixed data
        import numpy as np
        rng = np.random.default_rng(0)
        parts = [rng.integers(0, 256, 1 << 20, dtype=np.uint8).tobytes(),
                 (b"the quick brown fox " * 60000)]
    blob = b"".join(parts)
    reps = max(1, int(target_mb * 1e6) // len(blob))
    return blob * reps


def bench_zlibng(corpus: bytes, levels=(1, 6, 9), reps: int = 3) -> dict:
    z = ctypes.CDLL(LIB)
    z.compress2.restype = ctypes.c_int
    z.compress2.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_ulong),
                            ctypes.c_char_p, ctypes.c_ulong, ctypes.c_int]
    z.uncompress.restype = ctypes.c_int
    z.uncompress.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_ulong),
                             ctypes.c_char_p, ctypes.c_ulong]
    n = len(corpus)
    bound = n + n // 8 + 1024
    dst = ctypes.create_string_buffer(bound)
    out = {}
    for level in levels:
        best = 0.0
        csize = None
        for _ in range(reps):
            dlen = ctypes.c_ulong(bound)
            t = time.perf_counter()
            rc = z.compress2(dst, ctypes.byref(dlen), corpus, n, level)
            dt = time.perf_counter() - t
            assert rc == 0, rc
            csize = dlen.value
            best = max(best, n / dt)
        # decompress timing
        comp = dst.raw[:csize]
        ubuf = ctypes.create_string_buffer(n + 16)
        dbest = 0.0
        for _ in range(reps):
            ulen = ctypes.c_ulong(n + 16)
            t = time.perf_counter()
            rc = z.uncompress(ubuf, ctypes.byref(ulen), comp, csize)
            dt = time.perf_counter() - t
            assert rc == 0 and ulen.value == n
            dbest = max(dbest, n / dt)
        out[str(level)] = {
            "compress_MBps": round(best / 1e6, 2),
            "decompress_MBps": round(dbest / 1e6, 2),
            "size": csize,
            "ratio": round(csize / n, 5),
        }
    return out


def main():
    corpus = load_corpus()
    res = {
        "corpus_bytes": len(corpus),
        "corpus": "reference test/data + doc (lcet10, paper-100k.pdf, "
                  "fireworks.jpg, rfc1951/2) repeated",
        "library": "zlib-ng 2.2.2 (ZLIB_COMPAT, Release, this machine)",
        "levels": bench_zlibng(corpus),
    }
    path = os.path.join(ROOT, "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res["levels"], indent=2))
    print("written:", path)


if __name__ == "__main__":
    main()
