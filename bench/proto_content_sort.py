"""Prototype: content-sort candidate generation vs (hash,pos)-sort probes.

Sort positions by their 16-byte prefix (4 u32 words, pos tiebreak); the
nearest sorted predecessor with smaller pos approximates the longest
previous factor (suffix-array PSV), so few probe passes replace the 16/64
shifted hash probes. Measures compressed size + XLA cost on lcet10.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ['JAX_COMPILATION_CACHE_DIR'] = os.path.expanduser(
    '~/.cache/zlibng_tpu_xla_cpu')
import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np
import zlib

import zlibng_tpu.ops.lz77_jax as L
from zlibng_tpu.format.constants import MAX_MATCH, MIN_MATCH, WINDOW_SIZE
from zlibng_tpu.lz77.engine import TOO_FAR

U32, I32 = jnp.uint32, jnp.int32

PRED = int(os.environ.get("PRED", 4))
SUCC = int(os.environ.get("SUCC", 2))


def lz77_lane_content(data, enc_start, enc_end, hist_valid_from, chain,
                      lazy, max_lazy, nice=258, unit=0, strategy=0):
    N = data.shape[0]
    pos = jnp.arange(N, dtype=I32)
    n_ext = min(nice, MAX_MATCH)
    CX = (n_ext + 3) // 4 + 1
    pad = jnp.concatenate([data, jnp.zeros(4 * CX + 12, jnp.uint8)])
    w4 = L._build_w4(pad)

    W = L.PROBE_WORDS
    w2 = jnp.stack([w4[4 * i: N + 4 * i] for i in range(W)], axis=1)

    # content sort: 16-byte prefix words as keys, pos as final tiebreak
    keys = [w2[:, i] for i in range(W)] + [pos]
    sorted_ops = jax.lax.sort(tuple(keys), num_keys=W + 1)
    order = sorted_ops[-1].astype(I32)
    w2_s = jnp.stack(sorted_ops[:W], axis=1)
    inv = jnp.zeros(N, I32).at[order].set(pos)

    NEG = jnp.int32(-(1 << 30))
    best_score = jnp.full(N, NEG, I32)
    best_cand_s = jnp.zeros(N, I32)
    pos_s = order

    def probe(k, sign, best_score, best_cand_s):
        if sign > 0:   # predecessor in sort order
            cand = jnp.concatenate([jnp.zeros(k, I32), pos_s[:-k]])
            x = w2_s ^ jnp.concatenate(
                [jnp.zeros((k, W), U32), w2_s[:-k]], axis=0)
        else:          # successor in sort order
            cand = jnp.concatenate([pos_s[k:], jnp.zeros(k, I32)])
            x = w2_s ^ jnp.concatenate(
                [w2_s[k:], jnp.zeros((k, W), U32)], axis=0)
        l16 = L._ctz_bytes32(x[:, W - 1])
        for w in range(W - 2, -1, -1):
            l16 = jnp.where(x[:, w] != 0, L._ctz_bytes32(x[:, w]), 4 + l16)
        dist = pos_s - cand
        ok = (cand >= hist_valid_from) & (dist <= WINDOW_SIZE) & (dist > 0)
        score = jnp.where(ok, (l16 << 20) - dist, NEG)
        better = score > best_score
        return (jnp.where(better, score, best_score),
                jnp.where(better, cand, best_cand_s))

    npred = max(1, min(PRED, chain))
    nsucc = max(1, min(SUCC, chain))
    for k in range(1, npred + 1):
        best_score, best_cand_s = probe(k, +1, best_score, best_cand_s)
    for k in range(1, nsucc + 1):
        best_score, best_cand_s = probe(k, -1, best_score, best_cand_s)

    valid_s = best_score > NEG
    l16_s = (best_score + (pos_s - best_cand_s)) >> 20
    packed_s = jnp.where(valid_s & (l16_s >= MIN_MATCH),
                         (l16_s << 17) | best_cand_s, jnp.int32(-1))
    packed = packed_s[inv]
    has_cand = packed >= 0
    best_cand = jnp.where(has_cand, packed & 0x1FFFF, 0)
    l16 = jnp.where(has_cand, packed >> 17, 0)
    best_dist = jnp.where(has_cand, pos - best_cand, 0)

    # ---- identical tail to lz77_lane (extension, runs, filters, lazy) ----
    N_PROBE = 4 * L.PROBE_WORDS
    if n_ext <= N_PROBE:
        ext = l16
    else:
        need = (has_cand & (l16 >= N_PROBE)
                & (pos >= enc_start) & (pos < enc_end))
        rank = jnp.cumsum(need.astype(I32)) - 1
        total = jnp.sum(need.astype(I32))
        M = max(N // 8, 1024)
        Wm = jnp.stack([w4[4 * c: 4 * c + N] for c in range(CX)], axis=1)

        def wide_body(state):
            i, ext = state
            lo = i * M
            in_win = need & (rank >= lo) & (rank < lo + M)
            slot = jnp.where(in_win, rank - lo, M)
            idx = jnp.full(M, N, I32).at[slot].set(pos, mode="drop")
            live = idx < N
            safe = jnp.where(live, idx, 0)
            csafe = jnp.where(live, best_cand.at[safe].get(), 0)
            X = Wm[safe] ^ Wm[csafe]
            nzcol = jnp.where(X != 0, jnp.arange(CX, dtype=I32)[None, :], CX)
            fc = jnp.min(nzcol, axis=1)
            word_fc = jnp.where(nzcol == fc[:, None], X, 0).sum(axis=1)
            ext_c = 4 * fc + L._ctz_bytes32(word_fc.astype(U32))
            return i + 1, ext.at[idx].set(ext_c, mode="drop")

        _, ext = jax.lax.while_loop(
            lambda st: st[0] * M < total, wide_body, (jnp.int32(0), l16))
    cap = jnp.minimum(MAX_MATCH, enc_end - pos)
    if unit > 0:
        cap = jnp.minimum(cap, unit - ((pos - enc_start) % unit))
    blen = jnp.minimum(jnp.minimum(ext, n_ext), cap)
    blen = jnp.where(has_cand, blen, 0)

    eq = jnp.concatenate([data[1:] == data[:-1], jnp.zeros(1, bool)])
    falses = jnp.where(~eq, pos, N)
    next_false = jax.lax.cummin(falses[::-1])[::-1]
    run_pairs = next_false - pos
    prev_eq = jnp.concatenate([jnp.zeros(1, bool), eq[:-1]])
    run_ok = prev_eq & (pos - 1 >= hist_valid_from)
    run_len = jnp.where(run_ok, 1 + run_pairs, 0)
    run_len = jnp.minimum(jnp.minimum(run_len, MAX_MATCH), cap).astype(I32)
    use_run = run_len > blen
    blen = jnp.where(use_run, run_len, blen)
    best_dist = jnp.where(use_run, 1, best_dist)

    ok = (blen >= MIN_MATCH) & ~((blen == MIN_MATCH) & (best_dist > TOO_FAR))
    blen = jnp.where(ok, blen, 0)
    best_dist = jnp.where(ok, best_dist, 0)

    if lazy:
        nxt_len = jnp.concatenate([blen[1:], jnp.zeros(1, I32)])
        defer = (nxt_len > blen) & (blen < max_lazy)
    else:
        defer = jnp.zeros(N, bool)
    take = (blen >= MIN_MATCH) & ~defer
    step = jnp.where(take, blen, 1)
    return dict(step=step, take=take, blen=blen, bdist=best_dist)


def main():
    import zlibng_tpu.ops.deflate_tpu as D

    data = open('/root/reference/test/data/lcet10.txt', 'rb').read()
    pdf = open('/root/reference/test/data/paper-100k.pdf', 'rb').read()
    jpg = open('/root/reference/test/data/fireworks.jpg', 'rb').read()

    for lvl in (6, 9):
        for name, blob in (("lcet", data), ("pdf", pdf), ("jpg", jpg)):
            base = D.compress_tpu(blob, lvl)
            zref = zlib.compress(blob, lvl)
            L_orig = L.lz77_lane
            L.lz77_lane = lz77_lane_content
            D.lz77_lane = lz77_lane_content
            jax.clear_caches()
            try:
                new = D.compress_tpu(blob, lvl)
            finally:
                L.lz77_lane = L_orig
                D.lz77_lane = L_orig
                jax.clear_caches()
            assert zlib.decompress(new) == blob
            print(f"L{lvl} {name}: old={len(base)} new={len(new)} "
                  f"zlib={len(zref)} new/old={len(new)/len(base):.4f} "
                  f"new/zlib={len(new)/len(zref):.4f}", flush=True)

    # XLA cost comparison for one lane at L6/L9
    LANE = 98304
    dd = jnp.zeros(LANE, jnp.uint8)
    for lvl, chain in ((6, 16), (9, 64)):
        for tag, fn in (("old", L.lz77_lane), ("new", lz77_lane_content)):
            f = lambda d: fn(d, jnp.int32(32768), jnp.int32(LANE),
                             jnp.int32(0), chain, True, 32, 128 if lvl == 6
                             else 258, 16384)
            c = jax.jit(f).lower(dd).compile().cost_analysis()
            print(f"L{lvl} {tag}: flops={c.get('flops'):.3e} "
                  f"bytes={c.get('bytes accessed'):.3e}", flush=True)


if __name__ == '__main__':
    main()
