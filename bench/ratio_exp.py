"""Ratio experiment harness: compare our per-file compressed sizes vs the
reference zlib-ng build at given levels, with optional lz77 knob overrides.

Usage: python bench/ratio_exp.py [LEVELS] [KEY=VAL ...]
Knobs are set on zlibng_tpu.ops.lz77_jax / ops.deflate_tpu before tracing.
Run each variant in a fresh process (module constants bake into the trace).
"""
from __future__ import annotations

import ctypes
import sys
import time
import zlib

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

FILES = {
    "lcet10": "/root/reference/test/data/lcet10.txt",
    "pdf": "/root/reference/test/data/paper-100k.pdf",
    "jpg": "/root/reference/test/data/fireworks.jpg",
    "rfc1951": "/root/reference/doc/rfc1951.txt",
    "rfc1952": "/root/reference/doc/rfc1952.txt",
}


def zng_compress(zng, data, level):
    n = len(data)
    bound = zng.compressBound(ctypes.c_ulong(n))
    out = ctypes.create_string_buffer(bound)
    dlen = ctypes.c_ulong(bound)
    assert zng.compress2(out, ctypes.byref(dlen), data,
                         ctypes.c_ulong(n), level) == 0
    return out.raw[: dlen.value]


def main():
    levels = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "6,9").split(",")]
    from zlibng_tpu.ops import deflate_tpu, lz77_jax

    for kv in sys.argv[2:]:
        k, v = kv.split("=")
        mod = lz77_jax if hasattr(lz77_jax, k) else deflate_tpu
        setattr(mod, k, type(getattr(mod, k))(eval(v)))
        print(f"# {mod.__name__}.{k} = {getattr(mod, k)}")

    zng = ctypes.CDLL("/root/repo/.ref_build/libz.so")
    data = {k: open(p, "rb").read() for k, p in FILES.items()}
    for lvl in levels:
        tot_o = tot_r = 0
        t0 = time.time()
        for name, d in data.items():
            c = deflate_tpu.compress_tpu(d, lvl)
            assert zlib.decompress(c) == d
            ours, ref = len(c), len(zng_compress(zng, d, lvl))
            tot_o += ours
            tot_r += ref
            print(f"L{lvl} {name:8s} ours={ours:8d} zng={ref:8d} "
                  f"vs={ours/ref:.4f}")
        print(f"L{lvl} TOTAL vs_zng={tot_o/tot_r:.4f}  ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
