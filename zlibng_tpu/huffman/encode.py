"""Huffman encoding: length-limited tree build, canonical codes, and the
dynamic-block header descriptor (code-length-tree RLE).

Capability parity with reference trees.c: build_tree/gen_bitlen/gen_codes
(trees.c:185-405), scan_tree/send_tree RLE (trees.c:411-521), and the
stored/static/dynamic cost comparison of zng_tr_flush_block (trees.c:657-692).

Array-first design: code lengths are computed from a frequency sort plus the
Moffat–Katajainen in-place merge (O(n) after sort) instead of a pointer heap,
then zlib-style overflow adjustment limits lengths to 15 bits. Everything is
a flat numpy pass so the same steps can run batched across blocks (and, via
lax.scan, on device).
"""
from __future__ import annotations

import numpy as np

from ..format.constants import (
    BL_ORDER, MAX_BITS, MAX_BL_BITS, REP_3_6, REPZ_3_10, REPZ_11_138,
    canonical_codes, reverse_bits,
)


def huffman_code_lengths(freqs: np.ndarray, max_bits: int = MAX_BITS) -> np.ndarray:
    """Optimal-ish prefix code lengths for `freqs`, limited to max_bits.

    Uses the in-place sorted-merge construction, then the reference's
    overflow adjustment (trees.c gen_bitlen:185-278 semantics) when any
    length exceeds max_bits. Zero-frequency symbols get length 0. If only
    one symbol has nonzero frequency it gets length 1 (DEFLATE requires a
    decodable ≥1-bit code; mirrors trees.c max_code<2 handling).
    """
    freqs = np.asarray(freqs, dtype=np.int64)
    n = len(freqs)
    used = np.nonzero(freqs > 0)[0]
    lengths = np.zeros(n, dtype=np.int32)
    if used.size == 0:
        return lengths
    if used.size == 1:
        lengths[used[0]] = 1
        return lengths

    # --- Moffat-Katajainen in-place Huffman over sorted frequencies -------
    order = used[np.argsort(freqs[used], kind="stable")]
    a = freqs[order].astype(np.int64).copy()  # work array
    m = a.size
    # Phase 1: a[i] becomes parent pointers / internal weights
    leaf = 0   # next unprocessed leaf slot
    root = 0   # next internal node (stored in a[0..]) to absorb
    next_slot = 0
    # classic three-phase in-place algorithm
    s, r = 0, 0
    for t in range(m - 1):
        # first child
        if s >= m or (r < t and a[r] < a[s]):
            a[t] = a[r]
            a[r] = t
            r += 1
        else:
            a[t] = a[s]
            s += 1
        # second child
        if s >= m or (r < t and a[r] < a[s]):
            a[t] += a[r]
            a[r] = t
            r += 1
        else:
            a[t] += a[s]
            s += 1
    # Phase 2: internal node depths from parent pointers (right to left)
    a[m - 2] = 0
    for t in range(m - 3, -1, -1):
        a[t] = a[a[t]] + 1
    # Phase 3: leaf depths by counting
    avail, usedn, depth = 1, 0, 0
    root_idx = m - 2
    next_leaf = m - 1
    depths = np.zeros(m, dtype=np.int32)
    t = root_idx
    out_i = 0
    while avail > 0:
        # count internal nodes at this depth
        usedn = 0
        while t >= 0 and a[t] == depth:
            usedn += 1
            t -= 1
        # leaves at this depth
        for _ in range(avail - usedn):
            depths[out_i] = depth
            out_i += 1
        avail = 2 * usedn
        depth += 1
    # depths[] is in order of decreasing frequency; map back: `order` is
    # ascending frequency, depths assigned from most frequent (shallowest).
    lengths[order[::-1]] = depths

    if lengths.max() > max_bits:
        lengths = _limit_lengths(freqs, lengths, max_bits)
    return lengths


def _limit_lengths(freqs: np.ndarray, lengths: np.ndarray, max_bits: int) -> np.ndarray:
    """Reference-style overflow adjustment (trees.c gen_bitlen): clamp deep
    codes to max_bits, then move nodes down to restore Kraft equality."""
    lengths = lengths.copy()
    lengths[lengths > max_bits] = max_bits
    bl_count = np.bincount(lengths, minlength=max_bits + 1)
    bl_count[0] = 0
    # Restore Kraft equality exactly: after clamping, the tree is
    # oversubscribed by K - 2^max_bits units of 2^-max_bits. Each move
    # (demote one leaf from depth `bits` to bits+1, promote one max-depth
    # leaf to bits+1) reduces K by exactly one unit. The reference's loop
    # (trees.c gen_bitlen, overflow -= 2 per move) counts clamped *nodes*
    # and is only exact when every clamped node sat one level past the
    # limit; our sorted-merge construction can legally build deeper trees
    # (observed: depth 17 at max_bits 15), where the node count
    # under-removes and yields an oversubscribed — undecodable — header.
    kraft = int((bl_count[1:] << np.arange(max_bits - 1, -1, -1)).sum())
    target = 1 << max_bits
    while kraft > target:
        bits = max_bits - 1
        while bl_count[bits] == 0:
            bits -= 1
        bl_count[bits] -= 1
        bl_count[bits + 1] += 2
        bl_count[max_bits] -= 1
        kraft -= 1
    # Reassign lengths: symbols sorted by (old length asc, freq desc) get the
    # new length distribution shallow-to-deep (preserves optimality ordering).
    used = np.nonzero(lengths > 0)[0]
    key = lengths[used] * (freqs.max() + 1) - freqs[used]
    order = used[np.argsort(key, kind="stable")]
    new_lengths = np.repeat(
        np.arange(max_bits + 1), bl_count[: max_bits + 1]).astype(np.int32)
    lengths[order] = new_lengths
    return lengths


def huffman_table(freqs: np.ndarray, max_bits: int = MAX_BITS):
    """(lengths, lsb_first_codes) ready for bitstream emission.

    Dispatches to the native build (zng_host.c zng_huff_table — identical
    construction and tie-breaking, ~50x faster) when available; the numpy
    path below is the reference implementation and fallback."""
    freqs = np.asarray(freqs)
    if freqs.size <= 320:
        try:
            from .. import native
            if native.available():
                return native.huff_table(freqs, max_bits)
        except Exception:
            pass
    lengths = huffman_code_lengths(freqs, max_bits)
    codes = canonical_codes(lengths, max_bits)
    return lengths, reverse_bits(codes, lengths, max_bits)


# ---------------------------------------------------------------------------
# Dynamic block header descriptor (trees.c scan_tree/send_tree/build_bl_tree)
# ---------------------------------------------------------------------------
def rle_code_lengths(lengths: np.ndarray) -> list[tuple[int, int]]:
    """RLE a lengths array into (cl_symbol, extra_value) pairs using codes
    16/17/18 exactly like scan_tree (trees.c:411-453)."""
    out = []
    n = len(lengths)
    prev = -1
    i = 0
    while i < n:
        cur = int(lengths[i])
        run = 1
        while i + run < n and int(lengths[i + run]) == cur:
            run += 1
        if cur == 0:
            r = run
            while r >= 11:
                take = min(r, 138)
                out.append((REPZ_11_138, take - 11))
                r -= take
            if r >= 3:
                out.append((REPZ_3_10, r - 3))
                r = 0
            for _ in range(r):
                out.append((0, -1))
        else:
            r = run
            if cur != prev:
                out.append((cur, -1))
                r -= 1
            while r >= 3:
                take = min(r, 6)
                out.append((REP_3_6, take - 3))
                r -= take
            for _ in range(r):
                out.append((cur, -1))
        prev = cur
        i += run
    return out


# extra bit counts for cl codes 16/17/18
_CL_EXTRA = {REP_3_6: 2, REPZ_3_10: 3, REPZ_11_138: 7}


def build_dynamic_header(lit_lengths: np.ndarray, dist_lengths: np.ndarray):
    """Compute the full dynamic-block header as (bits, nbits) token list plus
    the chosen hlit/hdist/hclen (trees.c send_all_trees analog).

    Returns (header_tokens, header_bits_total). Native fast path mirrors
    this implementation exactly (zng_host.c zng_dyn_header).
    """
    try:
        from .. import native
        if native.available():
            tv, tb, total = native.dyn_header(lit_lengths, dist_lengths)
            return list(zip(tv.tolist(), tb.tolist())), total
    except Exception:
        pass
    # trailing-zero trimming with reference minimums (hlit>=257, hdist>=1)
    hlit = max(257, int(np.max(np.nonzero(lit_lengths)[0])) + 1) if np.any(lit_lengths) else 257
    nz_d = np.nonzero(dist_lengths)[0]
    hdist = max(1, int(nz_d.max()) + 1) if nz_d.size else 1

    rle = rle_code_lengths(np.concatenate([lit_lengths[:hlit], dist_lengths[:hdist]]))
    cl_freqs = np.zeros(19, dtype=np.int64)
    for sym, _ in rle:
        cl_freqs[sym] += 1
    cl_lengths, cl_codes = huffman_table(cl_freqs, MAX_BL_BITS)

    # hclen: trim trailing zeros in BL_ORDER permutation (min 4)
    perm = cl_lengths[BL_ORDER]
    nz = np.nonzero(perm)[0]
    hclen = max(4, int(nz.max()) + 1) if nz.size else 4

    tokens = [(hlit - 257, 5), (hdist - 1, 5), (hclen - 4, 4)]
    for i in range(hclen):
        tokens.append((int(perm[i]), 3))
    for sym, extra in rle:
        tokens.append((int(cl_codes[sym]), int(cl_lengths[sym])))
        if sym >= 16:
            tokens.append((extra, _CL_EXTRA[sym]))
    total_bits = sum(nb for _, nb in tokens)
    return tokens, total_bits
