"""LZ77 match engine — array-first (batch) formulation.

Capability parity with the reference match pipeline (insert_string_tpl.h
hashing, match_tpl.h chain walk + compare256, deflate_fast/slow greedy/lazy
parses) re-designed as data-parallel passes:

  hash      : every position hashed at once ((val*2654435761)>>16, the
              reference's 4-byte multiplicative hash, insert_string.c:13-15)
  candidates: sort positions by (hash, pos); the K preceding entries in the
              same hash bucket ARE the K most recent chain predecessors —
              a sort replaces the mutable head[]/prev[] tables
  extend    : 8-byte prefix probe for all K candidates (compare256-style
              first-mismatch via byte compare + argmin), then staged
              16-byte-chunk extension of the winner
  parse     : greedy/lazy selection as a jump-function over positions,
              materialized in O(log N) pointer-doubling rounds instead of a
              serial walk (same result as deflate_slow's 1-step lazy rule)

This module is pure numpy on purpose: identical array semantics port 1:1 to
jnp in ops/ (vmapped per lane, fori_loop for rounds); numpy remains the host
conformance/reference implementation the TPU kernels are tested against.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..format.constants import MAX_MATCH, MIN_MATCH, WINDOW_SIZE

HASH_MULT = np.uint32(2654435761)
TOO_FAR = 4096  # emit literal instead of len-3 match beyond this (deflate.h analog)


@dataclass(frozen=True)
class MatchConfig:
    """Per-level tuning (configuration_table analog, deflate.c:142-168)."""
    chain: int = 4          # K candidates per position (max_chain analog)
    lazy: bool = True       # defer to next position if its match is longer
    max_lazy: int = 16      # take immediately at/above this length
    nice: int = 128         # stop extension at this length
    max_len: int = MAX_MATCH


def hash4(data: np.ndarray) -> np.ndarray:
    """16-bit multiplicative hash of the 4 bytes at each position.

    data: (N,) uint8 (caller pads); returns (N,) int32. Tail positions
    (fewer than 4 real bytes) are the caller's concern via length caps.
    """
    if data.shape[0] < 4:
        return np.zeros(data.shape[0], np.int32)
    d = data.astype(np.uint32)
    v4 = d[:-3] | (d[1:-2] << 8) | (d[2:-1] << 16) | (d[3:] << 24)
    h = ((v4 * HASH_MULT) & np.uint32(0xFFFFFFFF)) >> np.uint32(16)
    return np.concatenate([h, np.zeros(3, np.uint32)]).astype(np.int32)


def candidates_by_sort(h: np.ndarray, K: int, window: int = WINDOW_SIZE) -> np.ndarray:
    """K most recent previous positions with the same hash, within `window`.

    Returns (N, K) int32, -1 where no valid candidate. Equivalent to walking
    the reference's prev[] chain K deep, computed by one sort.
    """
    N = h.shape[0]
    key = h.astype(np.int64) * N + np.arange(N, dtype=np.int64)
    order = np.argsort(key)                      # (N,) positions, hash-major
    h_sorted = h[order]
    pos = np.arange(N)
    cands = np.full((N, K), -1, dtype=np.int32)
    for k in range(1, K + 1):
        shifted = np.empty(N, dtype=np.int64)
        shifted[k:] = order[:-k]
        shifted[:k] = -1
        same = np.empty(N, dtype=bool)
        same[k:] = h_sorted[k:] == h_sorted[:-k]
        same[:k] = False
        cand_sorted = np.where(same, shifted, -1)
        # scatter back to position order
        cands[order, k - 1] = cand_sorted.astype(np.int32)
    # window constraint
    dist = pos[:, None] - cands
    cands = np.where((cands >= 0) & (dist <= window), cands, -1)
    return cands


def _prefix_len(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Leading equal bytes along the last axis (first-mismatch, compare256
    movemask+ctz analog: argmin over an equality mask)."""
    eq = a == b
    return np.where(eq.all(axis=-1), eq.shape[-1], np.argmin(eq, axis=-1))


def _build_w8(pad: np.ndarray) -> np.ndarray:
    """Unaligned 8-byte little-endian words at every byte offset: w8[i] =
    bytes i..i+7 as u64. One gather then replaces an (…,8) byte gather."""
    d = pad.astype(np.uint64)
    w = d[:-7].copy()
    for k in range(1, 8):
        w |= d[k:k + d.size - 7] << np.uint64(8 * k)
    return w


def _ctz_bytes(x: np.ndarray) -> np.ndarray:
    """Number of leading equal *bytes* given xor-of-words (0..8): count
    trailing zero bits / 8. Exact via float64 exponent of the lowest set bit."""
    lsb = x & (~x + np.uint64(1))
    e = np.frexp(lsb.astype(np.float64))[1] - 1
    return np.where(x == 0, 8, e >> 3).astype(np.int64)


def find_matches(data: np.ndarray, encode_start: int, encode_end: int,
                 cfg: MatchConfig, window: int = WINDOW_SIZE):
    """Best match (length, dist) per position in [encode_start, encode_end).

    data: (N,) uint8 lane = [history | payload | slack]; matches may reach
    into history (cross-block window) but never beyond encode_end.
    Returns (best_len, best_dist) arrays over the full lane, 0/0 where no
    usable match.
    """
    N = data.shape[0]
    if N < 4:
        z = np.zeros(N, np.int32)
        return z, z
    pad = np.concatenate([data, np.zeros(cfg.max_len + 16, np.uint8)])
    h = hash4(data)
    cands = candidates_by_sort(h, cfg.chain, window)       # (N, K)
    pos = np.arange(N, dtype=np.int64)

    # cap: matches end inside the payload
    cap = np.minimum(cfg.max_len, encode_end - pos)        # (N,)
    valid = cands >= 0
    w8 = _build_w8(pad)

    # stage 1: 16-byte prefix for every candidate (two u64 xors) — longer
    # probes break ties that the chain-order heuristic would get wrong
    ci = np.where(valid, cands, 0).astype(np.int64)
    x1 = w8[pos][:, None] ^ w8[ci]
    x2 = w8[pos + 8][:, None] ^ w8[ci + 8]
    len16 = _ctz_bytes(x1)
    len16 = np.where(x1 == 0, 8 + _ctz_bytes(x2), len16)   # (N, K)
    len16 = np.where(valid, len16, 0)

    # pick winner per position: longest prefix, then smallest distance
    dist_all = (pos[:, None] - cands).astype(np.int64)
    score = (len16 << 20) - np.where(valid, dist_all, 1 << 19)
    kbest = np.argmax(score, axis=-1)                      # (N,)
    best_cand = cands[pos, kbest].astype(np.int64)
    best_len = len16[pos, kbest]
    best_dist = np.where(best_cand >= 0, pos - best_cand, 0)

    # stage 2: staged 8-byte extension of winners that filled the probe.
    # (cfg.nice bounds candidate *search* quality, not the extension of the
    # chosen match — the reference's compare256 always extends to 258.)
    best_len = np.minimum(best_len, cap)
    active = (best_len == 16) & (best_len < cap) & (best_cand >= 0)
    max_rounds = (cfg.max_len - 8 + 7) // 8
    for _ in range(max_rounds):
        if not active.any():
            break
        idx = np.nonzero(active)[0]
        x = w8[idx + best_len[idx]] ^ w8[best_cand[idx] + best_len[idx]]
        e = _ctz_bytes(x)
        newlen = np.minimum(best_len[idx] + e, cap[idx])
        still = (e == 8) & (newlen < cap[idx])
        best_len[idx] = newlen
        active[idx] = still
    best_len = np.minimum(best_len, cap)

    # dist-1 run prepass: byte runs are the common long-match case and the
    # chain probe can miss/truncate them; compute exactly via the distance
    # to the next inequality (gather-free, mirrors deflate_rle's compare)
    eq = data[1:] == data[:-1]
    falses = np.where(~eq, np.arange(eq.size), eq.size)
    next_false = np.minimum.accumulate(falses[::-1])[::-1]
    run_pairs = np.zeros(N, dtype=np.int64)
    run_pairs[:eq.size] = next_false - np.arange(eq.size)
    prev_eq = np.concatenate([[False], eq])
    run_len = np.where(prev_eq & (pos - 1 >= 0), 1 + run_pairs, 0)
    run_len = np.minimum(np.minimum(run_len, cfg.max_len), cap)
    use_run = run_len > best_len
    best_len = np.where(use_run, run_len, best_len)
    best_dist = np.where(use_run, 1, best_dist)

    # drop sub-minimum and too-far-3 matches
    ok = (best_len >= MIN_MATCH) & ~((best_len == MIN_MATCH) & (best_dist > TOO_FAR))
    best_len = np.where(ok, best_len, 0)
    best_dist = np.where(ok, best_dist, 0)
    return best_len.astype(np.int32), best_dist.astype(np.int32)


def lazy_parse(best_len: np.ndarray, best_dist: np.ndarray,
               encode_start: int, encode_end: int, cfg: MatchConfig):
    """Greedy/lazy token selection via pointer-doubling.

    Returns (sel_pos, sel_len, sel_dist) compacted token arrays covering
    [encode_start, encode_end): sel_len==0 ⇒ literal at sel_pos.
    """
    N = best_len.shape[0]
    length = best_len.astype(np.int64)
    if cfg.lazy:
        nxt_len = np.concatenate([length[1:], [0]])
        defer = (nxt_len > length) & (length < cfg.max_lazy)
    else:
        defer = np.zeros(N, dtype=bool)
    take = (length >= MIN_MATCH) & ~defer
    step = np.where(take, length, 1)

    # jump function over [encode_start, encode_end) with sentinel end
    nxt = np.minimum(np.arange(N, dtype=np.int64) + step, encode_end)
    sel = _reachable_from(nxt, encode_start, encode_end)

    sel_idx = np.nonzero(sel)[0]
    sel_len = np.where(take[sel_idx], length[sel_idx], 0).astype(np.int32)
    sel_dist = np.where(take[sel_idx], best_dist[sel_idx], 0).astype(np.int32)
    return sel_idx.astype(np.int32), sel_len, sel_dist


def _reachable_from(nxt: np.ndarray, start: int, end: int) -> np.ndarray:
    """Mask (length N) of positions on the chain start → nxt[start] → … → end.

    Binary lifting: hops-to-end per node, then per-node landing check —
    O(log N) gather rounds, the parallel replacement for the serial walk.
    Works over domain [0, N] with `end` as the absorbing sentinel.
    """
    N = nxt.shape[0]
    idx = np.arange(N + 1, dtype=np.int64)
    J = np.where(idx < end, np.minimum(np.concatenate([nxt, [end]]), end), end)
    hops = (idx < end).astype(np.int64)
    nlev = max(1, int(np.ceil(np.log2(max(N, 2)))) + 1)
    levels = [J]
    hop_tab = [hops]
    for _ in range(nlev - 1):
        Jk, Hk = levels[-1], hop_tab[-1]
        hop_tab.append(Hk + Hk[Jk])
        levels.append(Jk[Jk])
    total = hop_tab[-1]                    # steps from node to `end` (saturated)
    steps = total[start] - total           # steps from start to node (if on chain)
    # landing[i] = jump(start, steps[i]) — J_k powers commute, apply bitwise
    cur = np.full(N + 1, start, dtype=np.int64)
    s = np.maximum(steps, 0)
    for k in range(nlev - 1, -1, -1):
        bit = 1 << k
        use = (s & bit) > 0
        cur = np.where(use, levels[k][cur], cur)
        s = np.where(use, s - bit, s)
    on_chain = (cur == idx) & (steps >= 0) & (idx >= start) & (idx < end)
    return on_chain[:N]
