"""Bisect lz77 core cost by building cumulative variants (vmap16, fetched)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from zlibng_tpu.ops.lz77_jax import _build_w4, _ctz_bytes32, _hash4
from zlibng_tpu.format.constants import MAX_MATCH, WINDOW_SIZE

N = 98304
I32, U32 = jnp.int32, jnp.uint32
CHAIN = 8
NICE = 128

text = open("/root/reference/test/data/lcet10.txt", "rb").read() * 4
lanes = np.zeros((16, N), np.uint8)
for i in range(16):
    s = (i * 65536) % (len(text) - N)
    lanes[i] = np.frombuffer(text[s:s + N], np.uint8)
lanes_d = jnp.asarray(lanes)


def variant(stage):
    def one(data):
        pos = jnp.arange(N, dtype=I32)
        n_ext = NICE
        CX = (n_ext + 3) // 4 + 1
        pad = jnp.concatenate([data, jnp.zeros(4 * CX + 12, jnp.uint8)])
        w4 = _build_w4(pad)
        h = _hash4(data)
        order = jnp.argsort(h, stable=True).astype(I32)
        if stage == "A":
            return order.sum()
        inv = jnp.argsort(order).astype(I32)
        if stage == "B":
            return inv.sum()
        h_sorted = h[order]
        w2 = jnp.stack([w4[:N], w4[4:N + 4]], axis=1)
        w2_s = w2[order]
        if stage == "C0":
            return w2_s.sum()
        NEG = jnp.int32(-(1 << 30))
        best_score = jnp.full(N, NEG, I32)
        best_cand_s = jnp.zeros(N, I32)
        pos_s = order
        for k in range(1, CHAIN + 1):
            cand = jnp.concatenate([jnp.zeros(k, I32), pos_s[:-k]])
            same = jnp.concatenate([jnp.zeros(k, bool), h_sorted[k:] == h_sorted[:-k]])
            x1 = w2_s[:, 0] ^ jnp.concatenate([jnp.zeros(k, U32), w2_s[:-k, 0]])
            x2 = w2_s[:, 1] ^ jnp.concatenate([jnp.zeros(k, U32), w2_s[:-k, 1]])
            l8 = jnp.where(x1 == 0, 4 + _ctz_bytes32(x2), _ctz_bytes32(x1))
            dist = pos_s - cand
            ok = same & (cand >= 0) & (dist <= WINDOW_SIZE) & (dist > 0)
            score = jnp.where(ok, (l8 << 20) - dist, NEG)
            better = score > best_score
            best_score = jnp.where(better, score, best_score)
            best_cand_s = jnp.where(better, cand, best_cand_s)
        if stage == "C":
            return best_cand_s.sum()
        packed_s = jnp.where(best_score > NEG, best_cand_s, jnp.int32(0xFFFFF))
        best_cand = packed_s[inv]
        if stage == "D":
            return best_cand.sum()
        has_cand = best_cand != 0xFFFFF
        best_cand = jnp.where(has_cand, best_cand, 0)
        W = jnp.stack([w4[4 * c: 4 * c + N] for c in range(CX)], axis=1)
        if stage == "E0":
            return W.sum()
        Wc = W[best_cand]
        if stage == "E1":
            return Wc.sum()
        X = W ^ Wc
        nzcol = jnp.where(X != 0, jnp.arange(CX, dtype=I32)[None, :], CX)
        fc = jnp.min(nzcol, axis=1)
        word_fc = jnp.where(nzcol == fc[:, None], X, 0).sum(axis=1).astype(U32)
        ext = 4 * fc + _ctz_bytes32(word_fc)
        return ext.sum()
    return jax.jit(jax.vmap(one))


for stage in ["A", "B", "C0", "C", "D", "E0", "E1", "F"]:
    f = variant(stage)
    r = f(lanes_d)
    _ = float(np.asarray(r).sum())
    best = 1e9
    for _ in range(3):
        t = time.perf_counter()
        r = f(lanes_d)
        _ = float(np.asarray(r).sum())
        best = min(best, time.perf_counter() - t)
    print(f"stage {stage:3s}: {best*1e3:7.0f} ms", flush=True)
print("ALLDONE", flush=True)
