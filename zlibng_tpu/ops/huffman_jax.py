"""Device (in-graph) Huffman table construction + dynamic-header build.

The round-4 bottleneck was the stage-2 host round trip: fetch per-unit
frequencies, build trees on the host (huffman/encode.py), upload code
tables. This module re-expresses the EXACT host construction as jittable
batched array programs so stage 2 needs no host involvement at all:

  huff_lengths    : Moffat–Katajainen in-place merge as a lax.scan over the
                    sorted work array + vectorized depth counting + the
                    Kraft-equality restore — bit-identical to
                    huffman/encode.py huffman_code_lengths (same tie rules)
  canonical + rev : canonical code assignment and per-length bit reversal,
                    vectorized (format/constants.py canonical_codes analog)
  dyn_header      : scan_tree RLE (trees.c:411-453 semantics) as a
                    316-step scan + code-length tree build + fixed-slot
                    header token assembly — token-identical to
                    huffman/encode.py build_dynamic_header

All functions are single-set; callers vmap over (lane, node) batches.
Frequencies fit int32 (unit totals <= 2^17).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..format.constants import (
    BL_ORDER, MAX_BITS, MAX_BL_BITS, REP_3_6, REPZ_3_10, REPZ_11_138,
)

I32 = jnp.int32
U32 = jnp.uint32

_DMAX = 64          # depth histogram size (tree depth < 64 for any n <= 320)
_FBIG = 1 << 22     # > any frequency this codec feeds (unit sums <= 2^17)


def _phase1_scan(a: jnp.ndarray, m: jnp.ndarray, n: int):
    """Moffat–Katajainen phase 1: a[:m] ascending weights -> parent
    pointers/internal weights, via the classic two-pointer pairing loop
    (huffman/encode.py:52-69). Returns the transformed work array."""

    def step(state, t):
        a, s, r = state
        live = t < m - 1

        def pick(a, s, r):
            av_s = a[jnp.minimum(s, n - 1)]
            av_r = a[jnp.minimum(r, n - 1)]
            use_r = (s >= m) | ((r < t) & (av_r < av_s))
            child = jnp.where(use_r, av_r, av_s)
            a = a.at[jnp.where(use_r & live, r, n)].set(t, mode="drop")
            return child, a, s + jnp.where(use_r, 0, 1), \
                r + jnp.where(use_r, 1, 0)

        # every mutation below is already live-gated through its scatter
        # index (dead steps write to the dropped index n), so no full-array
        # select is needed — a (G, n) where per step would dominate the
        # whole build
        c1, a, s1, r1 = pick(a, s, r)
        a = a.at[jnp.where(live, t, n)].set(c1, mode="drop")
        c2, a, s2, r2 = pick(a, s1, r1)
        a = a.at[jnp.where(live, t, n)].add(c2, mode="drop")
        s = jnp.where(live, s2, s)
        r = jnp.where(live, r2, r)
        return (a, s, r), None

    (a, _, _), _ = jax.lax.scan(step, (a, jnp.int32(0), jnp.int32(0)),
                                jnp.arange(n - 1, dtype=I32))
    return a


def _phase2_scan(a: jnp.ndarray, m: jnp.ndarray, n: int):
    """Phase 2: parent pointers -> internal node depths. The serial form
    (a[m-2]=0; a[t]=a[a[t]]+1 right-to-left) is a chain of increasing
    parent pointers, so depth = hops-to-root — computed in log2(n)
    pointer-doubling rounds instead of n sequential scan steps (the scan
    form measured ~45% of the whole device table build)."""
    root = jnp.maximum(m - 2, 0)
    idx = jnp.arange(n, dtype=I32)
    internal = idx < root
    J = jnp.where(internal, jnp.clip(a, 0, n - 1), root)
    H = internal.astype(I32)
    rounds = max(1, int(np.ceil(np.log2(max(n, 2)))))
    for _ in range(rounds):
        H = H + jnp.where(J != root, H[J], 0)
        J = J[J]
    return jnp.where(internal, H, jnp.where(idx == root, 0, a))


def huff_lengths(freqs: jnp.ndarray, max_bits: int) -> jnp.ndarray:
    """(n,) int32 freqs -> (n,) int32 code lengths, limited to max_bits.
    Bit-identical to huffman/encode.py huffman_code_lengths (same sort
    order, same merge tie-breaks, same Kraft restore + reassignment)."""
    n = freqs.shape[0]
    freqs = freqs.astype(I32)
    sym = jnp.arange(n, dtype=I32)
    nz = freqs > 0
    m = jnp.sum(nz.astype(I32))

    # ascending (freq, sym) among nonzero symbols; zeros pushed to the
    # end; freqs ride the sort as a payload operand (no post-sort gather)
    key = jnp.where(nz, freqs * n + sym, jnp.int32(0x7FFFFFF0))
    _, order, a0 = jax.lax.sort((key, sym, freqs), dimension=0, num_keys=1)

    a = _phase2_scan(_phase1_scan(a0, m, n), m, n)

    # phase 3 vectorized: internal node depth histogram -> leaves per depth
    idx = jnp.arange(n, dtype=I32)
    internal_mask = idx <= m - 2
    d = jnp.where(internal_mask, a, _DMAX - 1)
    ih = jnp.zeros(_DMAX, I32).at[d].add(internal_mask.astype(I32))

    def avail_step(avail, dd):
        leaves = avail - ih[dd]
        return 2 * ih[dd], leaves

    _, leaves = jax.lax.scan(avail_step, jnp.int32(1),
                             jnp.arange(_DMAX, dtype=I32))
    cum = jnp.cumsum(leaves)
    # leaf j (decreasing frequency) gets depth = first d with cum[d] > j
    j = jnp.arange(n, dtype=I32)
    depth_j = jnp.searchsorted(cum, j, side="right").astype(I32)
    # symbol for leaf j: order[m-1-j]
    tgt = order[jnp.clip(m - 1 - j, 0, n - 1)]
    lengths = jnp.zeros(n, I32).at[jnp.where(j < m, tgt, n)].set(
        depth_j, mode="drop")

    # single-symbol block: DEFLATE needs a >= 1-bit code
    lengths = jnp.where(m == 1, nz.astype(I32), lengths)

    # ---- Kraft restore (length limit), unconditional no-op when legal ----
    lengths = jnp.where(nz, jnp.minimum(lengths, max_bits), 0)
    bl = jnp.zeros(max_bits + 1, I32).at[jnp.where(nz, lengths, 0)].add(
        nz.astype(I32))
    bl = bl.at[0].set(0)
    shifts = (max_bits - jnp.arange(max_bits + 1, dtype=I32))
    kraft0 = jnp.sum(bl << shifts) - (bl[0] << max_bits)
    target = jnp.int32(1 << max_bits)

    def kr_cond(st):
        bl, kraft = st
        return kraft > target

    def kr_body(st):
        bl, kraft = st
        # deepest bits < max_bits with a leaf to demote
        cand = jnp.arange(max_bits + 1, dtype=I32)
        ok = (bl > 0) & (cand < max_bits) & (cand > 0)
        bits = jnp.max(jnp.where(ok, cand, 0))
        bl = bl.at[bits].add(-1)
        bl = bl.at[bits + 1].add(2)
        bl = bl.at[max_bits].add(-1)
        return bl, kraft - 1

    bl, _ = jax.lax.while_loop(kr_cond, kr_body, (bl, kraft0))

    # reassign lengths shallow-to-deep over symbols sorted by
    # (old length asc, freq desc, sym asc) — identity when nothing moved;
    # jnp.argsort is stable, so ties (same len+freq) keep symbol order
    key2 = jnp.where(nz, lengths * _FBIG - freqs, jnp.int32(0x7FFFFFF0))
    order2 = jnp.argsort(key2).astype(I32)
    cum_bl = jnp.cumsum(bl)
    new_len_j = jnp.searchsorted(cum_bl, j, side="right").astype(I32)
    lengths = jnp.zeros(n, I32).at[
        jnp.where(j < m, order2[j], n)].set(new_len_j, mode="drop")
    return jnp.where(nz, lengths, 0)


def canonical_rev_codes(lengths: jnp.ndarray, max_bits: int) -> jnp.ndarray:
    """Canonical codes for `lengths`, bit-reversed over each code's length
    (LSB-first emission form). Mirrors format/constants.py
    canonical_codes + reverse_bits."""
    n = lengths.shape[0]
    bl = jnp.zeros(max_bits + 1, I32).at[lengths].add(
        (lengths > 0).astype(I32))
    bl = bl.at[0].set(0)
    # next_code[b] = sum_{k<b} bl[k] << (b-k)
    b = jnp.arange(max_bits + 1, dtype=I32)
    k = jnp.arange(max_bits + 1, dtype=I32)
    sh = b[:, None] - k[None, :]
    contrib = jnp.where(sh > 0, bl[None, :] << jnp.maximum(sh, 0), 0)
    next_code = jnp.sum(contrib, axis=1)                 # (max_bits+1,)
    # rank among same-length symbols by symbol order (exclusive count)
    onehot = (lengths[:, None] == b[None, :]).astype(I32)      # (n, mb+1)
    rank = jnp.cumsum(onehot, axis=0) - onehot
    my_rank = jnp.sum(rank * onehot, axis=1)
    code = (next_code[lengths] + my_rank).astype(U32)
    # bit-reverse over max_bits then shift out unused high bits
    c = code
    rev = jnp.zeros_like(c)
    for _ in range(max_bits):
        rev = (rev << 1) | (c & 1)
        c = c >> 1
    rev = rev >> (max_bits - lengths).astype(U32)
    return jnp.where(lengths > 0, rev, 0).astype(I32)


def huff_table(freqs: jnp.ndarray, max_bits: int):
    """(lengths, lsb_first_codes) — in-graph analog of
    huffman/encode.py huffman_table."""
    lengths = huff_lengths(freqs, max_bits)
    return lengths, canonical_rev_codes(lengths, max_bits)


# ---------------------------------------------------------------------------
# Dynamic-block header (scan_tree RLE + bit-length tree + token assembly)
# ---------------------------------------------------------------------------
_CL_EXTRA_TAB = np.zeros(19, np.int32)
_CL_EXTRA_TAB[REP_3_6] = 2
_CL_EXTRA_TAB[REPZ_3_10] = 3
_CL_EXTRA_TAB[REPZ_11_138] = 7

_L_TOT = 286 + 30       # concatenated lengths array (hlit + hdist <= 316)
_TMAX = 320             # RLE tokens: singles <= L_TOT, reps cover >= 3 each
# slot 0 block header, slot 1 hlit/hdist/hclen, slots 2..20 perm,
# slots 21+2j / 22+2j the j-th RLE token's code + extra
HDR_SLOTS = 21 + 2 * _TMAX


def _rle_scan(v: jnp.ndarray, L: jnp.ndarray):
    """scan_tree RLE over v[:L] (v has a != sentinel beyond L). Returns
    (tok_sym (TMAX,), tok_extra (TMAX,), ntok). tok_extra = -1 for plain
    code-length symbols, else the repeat-count extra value."""
    n = v.shape[0]

    def step(state, i):
        syms, extras, cur, prevlen, count, maxc, minc = state
        live = i < L
        curlen = v[jnp.minimum(i, n - 1)]
        nextlen = jnp.where(i + 1 < L, v[jnp.minimum(i + 1, n - 1)],
                            jnp.int32(-2))
        cnt = count + 1
        flush = ~((cnt < maxc) & (curlen == nextlen))
        do = live & flush

        # emission cases (zlib scan_tree):
        #   singles: cnt < minc copies of curlen (cnt <= 3)
        #   rep:     nonzero run — literal first IF curlen != prevlen
        #            (continuation chunks of a long run skip it), then
        #            REP_3_6 over the remaining >= 3
        #   z10/z138: zero-run repeats
        em_singles = cnt < minc
        em_rep = (~em_singles) & (curlen != 0)
        em_z10 = (~em_singles) & (curlen == 0) & (cnt <= 10)
        rep_lit = em_rep & (curlen != prevlen)
        c_rep = cnt - rep_lit.astype(I32)          # >= 3 in both rep cases

        t0_sym = jnp.where(
            em_singles, curlen,
            jnp.where(rep_lit, curlen,
                      jnp.where(em_rep, jnp.int32(REP_3_6),
                                jnp.where(em_z10, jnp.int32(REPZ_3_10),
                                          jnp.int32(REPZ_11_138)))))
        t0_extra = jnp.where(
            em_singles | rep_lit, jnp.int32(-1),
            jnp.where(em_rep, c_rep - 3,
                      jnp.where(em_z10, cnt - 3, cnt - 11)))
        n0 = do
        # slot 1: second single, or REP_3_6 after the leading literal
        t1_sym = jnp.where(rep_lit, jnp.int32(REP_3_6), curlen)
        t1_extra = jnp.where(rep_lit, c_rep - 3, jnp.int32(-1))
        n1 = do & ((em_singles & (cnt >= 2)) | rep_lit)
        # slot 2: third single
        n2 = do & em_singles & (cnt >= 3)

        base = cur
        syms = syms.at[jnp.where(n0, base, _TMAX)].set(t0_sym, mode="drop")
        extras = extras.at[jnp.where(n0, base, _TMAX)].set(
            t0_extra, mode="drop")
        o1 = base + n0.astype(I32)
        syms = syms.at[jnp.where(n1, o1, _TMAX)].set(t1_sym, mode="drop")
        extras = extras.at[jnp.where(n1, o1, _TMAX)].set(
            t1_extra, mode="drop")
        o2 = o1 + n1.astype(I32)
        syms = syms.at[jnp.where(n2, o2, _TMAX)].set(curlen, mode="drop")
        extras = extras.at[jnp.where(n2, o2, _TMAX)].set(-1, mode="drop")
        cur = jnp.where(do, o2 + n2.astype(I32), cur)

        prevlen = jnp.where(do, curlen, prevlen)
        count = jnp.where(live, jnp.where(flush, 0, cnt), count)
        maxc = jnp.where(
            do, jnp.where(nextlen == 0, 138,
                          jnp.where(curlen == nextlen, 6, 7)), maxc)
        minc = jnp.where(
            do, jnp.where(nextlen == 0, 3,
                          jnp.where(curlen == nextlen, 3, 4)), minc)
        return (syms, extras, cur, prevlen, count, maxc, minc), None

    syms0 = jnp.zeros(_TMAX, I32)
    extras0 = jnp.full(_TMAX, -1, I32)
    # zlib init: prevlen=-1; max/min from tree[0]
    first_zero = v[0] == 0
    maxc0 = jnp.where(first_zero, 138, 7)
    minc0 = jnp.where(first_zero, 3, 4)
    (syms, extras, ntok, *_), _ = jax.lax.scan(
        step, (syms0, extras0, jnp.int32(0), jnp.int32(-1), jnp.int32(0),
               maxc0, minc0),
        jnp.arange(_L_TOT, dtype=I32))
    return syms, extras, ntok


def dyn_header(lit_lengths: jnp.ndarray, dist_lengths: jnp.ndarray,
               btype_bits: jnp.ndarray):
    """Full dynamic-block header as fixed-slot (lo, nb) token arrays plus
    the total bit count. Token-stream-identical to
    huffman/encode.py build_dynamic_header, with the 3-bit block header
    (btype_bits: final|btype<<1) prepended in slot 0."""
    ll = lit_lengths.astype(I32)
    dl = dist_lengths.astype(I32)
    i286 = jnp.arange(286, dtype=I32)
    i30 = jnp.arange(30, dtype=I32)
    hlit = jnp.maximum(257, jnp.max(jnp.where(ll[:286] > 0, i286 + 1, 0)))
    hdist = jnp.maximum(1, jnp.max(jnp.where(dl > 0, i30 + 1, 0)))

    # concatenated lengths v[i] = ll[i] (i<hlit) else dl[i-hlit]
    i = jnp.arange(_L_TOT, dtype=I32)
    ll_pad = jnp.concatenate([ll[:286], jnp.zeros(30, I32)])
    dl_pad = jnp.concatenate([dl, jnp.zeros(286, I32)])
    v = jnp.where(i < hlit, ll_pad[i],
                  dl_pad[jnp.clip(i - hlit, 0, 315)])
    L = hlit + hdist

    syms, extras, ntok = _rle_scan(v, L)
    live = jnp.arange(_TMAX, dtype=I32) < ntok
    cl_freqs = jnp.zeros(19, I32).at[jnp.where(live, syms, 19)].add(
        1, mode="drop")
    cl_len, cl_code = huff_table(cl_freqs, MAX_BL_BITS)

    perm = cl_len[jnp.asarray(BL_ORDER.astype(np.int32))]
    i19 = jnp.arange(19, dtype=I32)
    hclen = jnp.maximum(4, jnp.max(jnp.where(perm > 0, i19 + 1, 0)))

    ext_tab = jnp.asarray(_CL_EXTRA_TAB)
    lo = jnp.zeros(HDR_SLOTS, U32)
    nb = jnp.zeros(HDR_SLOTS, I32)
    lo = lo.at[0].set(btype_bits.astype(U32))
    nb = nb.at[0].set(3)
    lo = lo.at[1].set((hlit - 257).astype(U32) |
                      ((hdist - 1).astype(U32) << 5) |
                      ((hclen - 4).astype(U32) << 10))
    nb = nb.at[1].set(14)
    # slots 2..20: the hclen 3-bit perm entries (absent -> nb 0)
    lo = lo.at[2:21].set(perm.astype(U32))
    nb = nb.at[2:21].set(jnp.where(i19 < hclen, 3, 0))
    # slots 21+2j / 22+2j: cl code + optional extra for RLE token j
    cl_lo = jnp.where(live, cl_code[syms], 0).astype(U32)
    cl_nb = jnp.where(live, cl_len[syms], 0)
    ex_nb = jnp.where(live & (extras >= 0), ext_tab[syms], 0)
    ex_lo = jnp.where(ex_nb > 0, extras, 0).astype(U32)
    lo = lo.at[21::2].set(cl_lo)
    nb = nb.at[21::2].set(cl_nb)
    lo = lo.at[22::2].set(ex_lo)
    nb = nb.at[22::2].set(ex_nb)
    return lo, nb, jnp.sum(nb)
