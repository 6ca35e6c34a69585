"""Isolate lz77_lane sub-stage costs on TPU with in-graph repetition.

Each variant repeats its core op R times inside one jit (chained through a
data dependency) so the ~28 ms tunnel dispatch floor amortizes away.
Per-op ms = (measured - floor) / R.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from zlibng_tpu.ops.lz77_jax import (
    _build_w4, _ctz_bytes32, _hash4, _reachable_jax, lane_freqs, lz77_lane,
)

N = 98304
I32 = jnp.int32
U32 = jnp.uint32

text = open("/root/reference/test/data/lcet10.txt", "rb").read() * 2
data = np.frombuffer(text[:N], np.uint8)
data_d = jnp.asarray(data)


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].sum())
    best = 1e9
    for _ in range(reps):
        t = time.perf_counter()
        out = fn(*args)
        s = sum(float(x.sum()) for x in jax.tree.leaves(out))
        best = min(best, time.perf_counter() - t)
    print(f"{name:36s}: {best*1e3:8.1f} ms", flush=True)


R = 8

# 1. hash + argsort chained
def f_sort(d):
    acc = jnp.int32(0)
    for _ in range(R):
        h = _hash4(d) + (acc & 1)
        o = jnp.argsort(h, stable=True)
        acc = acc + o[0]
    return acc
timed(f"hash+argsort x{R}", jax.jit(f_sort), data_d)

# 2. double argsort (order+inv)
def f_sort2(d):
    acc = jnp.int32(0)
    for _ in range(R):
        h = _hash4(d) + (acc & 1)
        o = jnp.argsort(h, stable=True)
        inv = jnp.argsort(o)
        acc = acc + inv[0]
    return acc
timed(f"argsort+inverse x{R}", jax.jit(f_sort2), data_d)

# 3. probe loop (chain=8 shifts + ctz), no gathers
def f_probe(d):
    pad = jnp.concatenate([d, jnp.zeros(160, jnp.uint8)])
    w4 = _build_w4(pad)
    w2a, w2b = w4[:N], w4[4:N + 4]
    acc = jnp.uint32(0)
    for _ in range(R):
        a = w2a ^ acc
        best = jnp.zeros(N, I32)
        for k in range(1, 9):
            x1 = a ^ jnp.concatenate([jnp.zeros(k, U32), a[:-k]])
            x2 = w2b ^ jnp.concatenate([jnp.zeros(k, U32), w2b[:-k]])
            l8 = jnp.where(x1 == 0, 4 + _ctz_bytes32(x2), _ctz_bytes32(x1))
            best = jnp.maximum(best, l8)
        acc = acc + best[0].astype(U32)
    return acc
timed(f"probe chain=8 x{R}", jax.jit(f_probe), data_d)

# 4. row gather width 2 (w2[order])
def f_rg2(d):
    pad = jnp.concatenate([d, jnp.zeros(160, jnp.uint8)])
    w4 = _build_w4(pad)
    w2 = jnp.stack([w4[:N], w4[4:N + 4]], axis=1)
    idx = jnp.argsort(_hash4(d), stable=True)
    acc = jnp.uint32(0)
    for _ in range(R):
        g = w2[(idx + acc.astype(I32)) % N]
        acc = acc + g[0, 0]
    return acc
timed(f"row-gather w2 x{R}", jax.jit(f_rg2), data_d)

# 5. point gather
def f_pg(d):
    idx = jnp.argsort(_hash4(d), stable=True)
    v = idx
    for _ in range(R * 2):
        v = idx[v]
    return v
timed(f"point-gather x{R*2}", jax.jit(f_pg), data_d)

# 6. extension block: W stack CX=33 + row gather + reduce
def f_ext(d):
    CX = 33
    pad = jnp.concatenate([d, jnp.zeros(4 * CX + 16, jnp.uint8)])
    w4 = _build_w4(pad)
    cand = (jnp.arange(N, dtype=I32) * 7919) % N
    acc = jnp.uint32(0)
    for _ in range(R // 2):
        W = jnp.stack([w4[4 * c: 4 * c + N] for c in range(CX)], axis=1)
        Wc = W[(cand + acc.astype(I32)) % N]
        X = W ^ Wc
        nz = jnp.where(X != 0, jnp.arange(CX, dtype=I32)[None, :], CX)
        fc = jnp.min(nz, axis=1)
        acc = acc + fc.sum().astype(U32)
    return acc
timed(f"extension CX=33 x{R//2}", jax.jit(f_ext), data_d)

# 7. reachability lifting
def f_reach(d):
    nxt = jnp.minimum(jnp.arange(N, dtype=I32) + 1 + (d[:N] & 3).astype(I32), N)
    acc = jnp.int32(0)
    for _ in range(R // 2):
        sel = _reachable_jax(jnp.minimum(nxt + (acc & 1), N), jnp.int32(0),
                             jnp.int32(N))
        acc = acc + sel.sum().astype(I32)
    return acc
timed(f"reachability x{R//2}", jax.jit(f_reach), data_d)

# 8. lane_freqs
def f_freq(d):
    lsym = d.astype(I32)
    sel = (d & 1) == 0
    acc = jnp.int32(0)
    for _ in range(R // 2):
        lf, df = lane_freqs(lsym + (acc & 1), lsym & 31, sel, sel)
        acc = acc + lf.sum()
    return acc
timed(f"lane_freqs x{R//2}", jax.jit(f_freq), data_d)

# 9. whole lz77_lane
f_full = jax.jit(lambda d: lz77_lane(d, jnp.int32(32768), jnp.int32(N),
                                     jnp.int32(0), 8, True, 16, 128))
timed("lz77_lane (whole, x1)", f_full, data_d)

print("ALLDONE", flush=True)
