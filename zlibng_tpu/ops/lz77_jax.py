"""Device (TPU) LZ77 stage: hash → candidates → match extension → lazy parse.

Mirror of lz77/engine.py (the numpy conformance implementation) in jitted
jnp, designed for TPU constraints:
  * uint32 arithmetic only (no x64): 8-byte probes are two u32 word compares,
    ctz via population_count — the compare256 movemask+ctz analog
    (reference compare256_avx2.c:18-47)
  * one stable argsort replaces the head[]/prev[] hash-chain tables
    (insert_string_tpl.h) — K shifted compares give the K most recent
    same-hash predecessors
  * match extension: masked full-width rounds under lax.while_loop
  * greedy/lazy parse (deflate_slow semantics): pointer-doubling reachability,
    17 fixed gather rounds for 128K lanes
  * length/dist → code mapping computed arithmetically (floor_log2 via
    frexp) — no table gathers on the hot path

Each lane = [history | payload]; lanes are vmapped. Symbol frequencies for
the Huffman stage are computed per-lane with one-hot matmuls (MXU) rather
than scatter-adds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..format.constants import MAX_MATCH, MIN_MATCH, WINDOW_SIZE
from ..lz77.engine import HASH_MULT, TOO_FAR

U32 = jnp.uint32
I32 = jnp.int32


def _hash4(data: jnp.ndarray) -> jnp.ndarray:
    """(N,) uint8 -> (N,) int32 16-bit multiplicative hash of 4 bytes."""
    d = data.astype(U32)
    N = d.shape[0]
    d1 = jnp.concatenate([d[1:], jnp.zeros(1, U32)])
    d2 = jnp.concatenate([d[2:], jnp.zeros(2, U32)])
    d3 = jnp.concatenate([d[3:], jnp.zeros(3, U32)])
    v4 = d | (d1 << 8) | (d2 << 16) | (d3 << 24)
    return ((v4 * U32(HASH_MULT)) >> U32(16)).astype(I32)


def _build_w4(pad: jnp.ndarray) -> jnp.ndarray:
    """Little-endian 4-byte word at every byte offset of `pad` (M,) uint8."""
    d = pad.astype(U32)
    M = d.shape[0]
    w = d[: M - 3] | (d[1: M - 2] << 8) | (d[2: M - 1] << 16) | (d[3:] << 24)
    return w


def _ctz_bytes32(x: jnp.ndarray) -> jnp.ndarray:
    """Leading equal bytes from a u32 xor (0..4): ctz(x)/8, 4 if x==0."""
    lsb = x & (~x + U32(1))
    ctz = jax.lax.population_count(lsb - U32(1))
    return jnp.where(x == 0, 4, (ctz >> U32(3)).astype(I32))


def _floor_log2(x: jnp.ndarray) -> jnp.ndarray:
    """floor(log2(x)) for x >= 1 (int32), exact via f32 exponent (x < 2^24)."""
    _, e = jnp.frexp(x.astype(jnp.float32))
    return (e - 1).astype(I32)


def length_code_arith(length: jnp.ndarray) -> jnp.ndarray:
    """Match length (3..258) -> lit/len symbol (257..285), gather-free."""
    l3 = (length - 3).astype(I32)
    e = jnp.maximum(_floor_log2(jnp.maximum(l3, 1)) - 2, 0)
    code_hi = 257 + ((e + 1) << 2) + ((l3 >> e) & 3)
    code = jnp.where(l3 < 8, 257 + l3, code_hi)
    return jnp.where(length == 258, 285, code)


def dist_code_arith(dist: jnp.ndarray) -> jnp.ndarray:
    """Distance (1..32768) -> distance symbol (0..29), gather-free."""
    d1 = (dist - 1).astype(I32)
    e = jnp.maximum(_floor_log2(jnp.maximum(d1, 1)) - 1, 0)
    code_hi = ((e + 1) << 1) + ((d1 >> e) & 1)
    return jnp.where(d1 < 4, d1, code_hi)


def length_extra_arith(length: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(extra_nbits, extra_value) for a match length, gather-free."""
    l3 = (length - 3).astype(I32)
    e = jnp.maximum(_floor_log2(jnp.maximum(l3, 1)) - 2, 0)
    e = jnp.where(l3 < 8, 0, e)
    e = jnp.where(length == 258, 0, e)
    val = jnp.where(length == 258, 0, l3 & ((1 << e) - 1))
    return e, val


def dist_extra_arith(dist: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    d1 = (dist - 1).astype(I32)
    e = jnp.maximum(_floor_log2(jnp.maximum(d1, 1)) - 1, 0)
    e = jnp.where(d1 < 4, 0, e)
    return e, d1 & ((1 << e) - 1)


# ---------------------------------------------------------------------------
# stage 1 core (single lane; vmapped by caller)
# ---------------------------------------------------------------------------
def lz77_lane(data: jnp.ndarray, enc_start: jnp.ndarray, enc_end: jnp.ndarray,
              hist_valid_from: jnp.ndarray, chain: int, lazy: bool,
              max_lazy: int) -> dict:
    """data: (LANE,) uint8. enc_start/enc_end/hist_valid_from: () int32.
    Returns per-position token info dict (fixed shapes)."""
    N = data.shape[0]
    pos = jnp.arange(N, dtype=I32)
    pad = jnp.concatenate([data, jnp.zeros(MAX_MATCH + 8, jnp.uint8)])
    w4 = _build_w4(pad)                      # (N + MAX_MATCH + 5,)
    h = _hash4(data)

    # ---- candidates via one stable sort --------------------------------
    order = jnp.argsort(h, stable=True).astype(I32)     # (N,)
    h_sorted = h[order]
    len8 = jnp.zeros((N, chain), I32)
    cands = jnp.full((N, chain), -1, I32)
    p_w1 = w4[pos]
    p_w2 = w4[jnp.minimum(pos + 4, w4.shape[0] - 1)]
    for k in range(1, chain + 1):
        cand_sorted = jnp.concatenate([jnp.full(k, -1, I32), order[:-k]])
        same = jnp.concatenate([jnp.zeros(k, bool), h_sorted[k:] == h_sorted[:-k]])
        cand_sorted = jnp.where(same, cand_sorted, -1)
        ck = jnp.zeros(N, I32).at[order].set(cand_sorted)  # back to pos order
        dist_k = pos - ck
        ok = (ck >= hist_valid_from) & (dist_k <= WINDOW_SIZE) & (ck >= 0)
        ck = jnp.where(ok, ck, -1)
        # 8-byte probe: two u32 xors
        ck_s = jnp.maximum(ck, 0)
        x1 = p_w1 ^ w4[ck_s]
        x2 = p_w2 ^ w4[jnp.minimum(ck_s + 4, w4.shape[0] - 1)]
        l1 = _ctz_bytes32(x1)
        l8 = jnp.where(x1 == 0, 4 + _ctz_bytes32(x2), l1)
        cands = cands.at[:, k - 1].set(ck)
        len8 = len8.at[:, k - 1].set(jnp.where(ok, l8, 0))

    # ---- winner: longest 8-probe, then nearest -------------------------
    dist_all = pos[:, None] - cands
    valid = cands >= 0
    score = (len8 << 20) - jnp.where(valid, dist_all, 1 << 19)
    kbest = jnp.argmax(score, axis=-1)
    best_cand = jnp.take_along_axis(cands, kbest[:, None], axis=-1)[:, 0]
    blen = jnp.take_along_axis(len8, kbest[:, None], axis=-1)[:, 0]
    best_dist = jnp.where(best_cand >= 0, pos - best_cand, 0)

    cap = jnp.minimum(MAX_MATCH, enc_end - pos)
    blen = jnp.minimum(blen, cap)

    # ---- extension: masked 8-byte rounds under while_loop --------------
    def ext_cond(state):
        blen, active = state
        return jnp.any(active)

    def ext_body(state):
        blen, active = state
        at = jnp.where(active, pos + blen, 0)
        ct = jnp.where(active, jnp.maximum(best_cand, 0) + blen, 0)
        x1 = w4[at] ^ w4[ct]
        x2 = w4[jnp.minimum(at + 4, w4.shape[0] - 1)] ^ \
            w4[jnp.minimum(ct + 4, w4.shape[0] - 1)]
        e = jnp.where(x1 == 0, 4 + _ctz_bytes32(x2), _ctz_bytes32(x1))
        newlen = jnp.minimum(blen + jnp.where(active, e, 0), cap)
        active = active & (e == 8) & (newlen < cap)
        return newlen, active

    active0 = (blen == 8) & (blen < cap) & (best_cand >= 0)
    blen, _ = jax.lax.while_loop(ext_cond, ext_body, (blen, active0))
    blen = jnp.minimum(blen, cap)

    # ---- minimum / too-far filters -------------------------------------
    ok = (blen >= MIN_MATCH) & ~((blen == MIN_MATCH) & (best_dist > TOO_FAR))
    blen = jnp.where(ok, blen, 0)
    best_dist = jnp.where(ok, best_dist, 0)

    # ---- lazy parse: jump function + pointer-doubling reachability -----
    if lazy:
        nxt_len = jnp.concatenate([blen[1:], jnp.zeros(1, I32)])
        defer = (nxt_len > blen) & (blen < max_lazy)
    else:
        defer = jnp.zeros(N, bool)
    take = (blen >= MIN_MATCH) & ~defer
    step = jnp.where(take, blen, 1)
    nxt = jnp.minimum(pos + step, enc_end)

    sel = _reachable_jax(nxt, enc_start, enc_end)

    tok_len = jnp.where(sel & take, blen, 0)
    tok_dist = jnp.where(sel & take, best_dist, 0)
    is_match = tok_len > 0
    lsym = jnp.where(is_match, length_code_arith(jnp.maximum(tok_len, 3)),
                     data.astype(I32))
    dsym = jnp.where(is_match, dist_code_arith(jnp.maximum(tok_dist, 1)), 0)
    return dict(sel=sel, tok_len=tok_len, tok_dist=tok_dist,
                lsym=lsym, dsym=dsym)


def _reachable_jax(nxt: jnp.ndarray, start: jnp.ndarray, end: jnp.ndarray):
    """Jax mirror of lz77.engine._reachable_from (domain [0, N], sentinel at
    `end`); start/end are traced scalars."""
    N = nxt.shape[0]
    idx = jnp.arange(N + 1, dtype=I32)
    J = jnp.where(idx < end, jnp.minimum(jnp.concatenate([nxt, end[None]]), end), end)
    hops = (idx < end).astype(I32)
    nlev = max(1, int(np.ceil(np.log2(max(N, 2)))) + 1)
    levels = [J]
    hop_tab = [hops]
    for _ in range(nlev - 1):
        Jk, Hk = levels[-1], hop_tab[-1]
        hop_tab.append(Hk + Hk[Jk])
        levels.append(Jk[Jk])
    total = hop_tab[-1]
    steps = total[start] - total
    cur = jnp.full(N + 1, start, dtype=I32)
    s = jnp.maximum(steps, 0)
    for k in range(nlev - 1, -1, -1):
        bit = 1 << k
        use = (s & bit) > 0
        cur = jnp.where(use, levels[k][cur], cur)
        s = jnp.where(use, s - bit, s)
    on_chain = (cur == idx) & (steps >= 0) & (idx >= start) & (idx < end)
    return on_chain[:N]


# ---------------------------------------------------------------------------
# frequencies (per lane): one-hot matmul on the MXU instead of scatter-add
# ---------------------------------------------------------------------------
def lane_freqs(lsym: jnp.ndarray, dsym: jnp.ndarray, sel: jnp.ndarray,
               is_match: jnp.ndarray):
    """Histogram lit/len syms (286) and dist syms (30) for selected tokens."""
    N = lsym.shape[0]
    CH = 2048  # chunked one-hot keeps the (CH, 286) intermediate in VMEM
    lfreq = jnp.zeros(288, I32)
    dfreq = jnp.zeros(32, I32)
    lw = sel.astype(jnp.int8)
    dw = (sel & is_match).astype(jnp.int8)
    ls = lsym.reshape(N // CH, CH) if N % CH == 0 else None
    if ls is None:
        # fallback: scatter-add
        lfreq = lfreq.at[lsym].add(sel.astype(I32))
        dfreq = dfreq.at[dsym].add((sel & is_match).astype(I32))
        return lfreq[:286], dfreq[:30]
    ds = dsym.reshape(N // CH, CH)
    lwc = lw.reshape(N // CH, CH)
    dwc = dw.reshape(N // CH, CH)

    def body(i, acc):
        lfreq, dfreq = acc
        oh = jax.nn.one_hot(ls[i], 288, dtype=jnp.int8)       # (CH, 288)
        lfreq = lfreq + jnp.matmul(lwc[i].astype(jnp.int8)[None, :], oh,
                                   preferred_element_type=I32)[0]
        ohd = jax.nn.one_hot(ds[i], 32, dtype=jnp.int8)
        dfreq = dfreq + jnp.matmul(dwc[i].astype(jnp.int8)[None, :], ohd,
                                   preferred_element_type=I32)[0]
        return lfreq, dfreq

    lfreq, dfreq = jax.lax.fori_loop(0, N // CH, body, (lfreq, dfreq))
    return lfreq[:286], dfreq[:30]
