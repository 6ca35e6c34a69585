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

# Probe width in 4-byte words (2 = 8-byte probes, 4 = 16-byte). Wider
# probes break more winner ties exactly; narrower ones are ~2x cheaper
# per probe pass and defer tie-breaks to the wide-extension stage.
PROBE_WORDS = 4


def probe_offsets(chain: int) -> tuple[int, ...]:
    """Sorted-neighbor offsets probed per position (k-th most recent
    same-hash predecessor). Linear: distant same-hash entries are distinct
    candidates, not duplicates (measured: sparse ladders lose ~0.3-1.1%)."""
    return tuple(range(1, chain + 1))


# Probe escalation split: the first DENSE_PROBES sorted-neighbor offsets run
# densely over every row; deeper offsets run only for rows that are still
# "hunting" (best probe < GOOD_L16 bytes), can emit tokens, and actually
# have a deeper same-hash predecessor — compacted into fixed-size batches.
# Setting the split: a dense pass is pure shifted compares (~19 ms per pass
# for 32 lanes, measured on-device) while each compacted deep step pays two
# point-indexed row gathers per batch row; on text (~50% of rows hunting
# after 4 probes) the gather form measured ~4.7x SLOWER than running the
# same depths densely, and at the L9 tail (17..64) dense-64 measured EQUAL
# to the compacted form while being structurally simpler (round-3 bench:
# compacted L9 regressed 3.05 -> 0.71 MB/s). Dense therefore covers every
# shipped level's chain (<= 64, deflate.c:142-168 tiers); the compacted
# loop only serves deflateTune chains beyond 64, where the hunting
# fraction after 64 dense probes is small enough for compaction to win.
DENSE_PROBES = 64
GOOD_L16 = 12


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


def _probe_best_xla(w2_s: jnp.ndarray, h_sorted: jnp.ndarray,
                    pos_s: jnp.ndarray, hist_valid_from,
                    dense: int, gate_depth: int, good_l16: int,
                    max_dist: int = WINDOW_SIZE):
    """Dense probe sweep, pure-XLA form: for k = 1..dense compare every
    sorted row against its k-th predecessor (shifted arrays) and keep the
    best (probe_len << 20) - dist score. Reference semantics: the
    match_tpl.h:130-174 chain walk; rows whose best reaches `good_l16`
    after `gate_depth` probes stop improving (match_tpl.h:84-88).
    The Pallas kernel in probe_pallas.py computes exactly this in VMEM."""
    N, W = w2_s.shape
    NEG = jnp.int32(-(1 << 30))
    best_score = jnp.full(N, NEG, I32)
    best_cand_s = jnp.zeros(N, I32)
    hunting = None
    for k in probe_offsets(dense):
        if k == gate_depth + 1:
            cur_l16 = jnp.where(
                best_score > NEG,
                (best_score + (pos_s - best_cand_s)) >> 20, 0)
            hunting = cur_l16 < good_l16
        cand = jnp.concatenate([jnp.zeros(k, I32), pos_s[:-k]])
        same = jnp.concatenate([jnp.zeros(k, bool),
                                h_sorted[k:] == h_sorted[:-k]])
        zk = jnp.zeros((k, W), U32)
        x = w2_s ^ jnp.concatenate([zk, w2_s[:-k]], axis=0)  # (N, W)
        l16 = _ctz_bytes32(x[:, W - 1])
        for w in range(W - 2, -1, -1):
            l16 = jnp.where(x[:, w] != 0, _ctz_bytes32(x[:, w]), 4 + l16)
        dist = pos_s - cand
        ok = same & (cand >= hist_valid_from) & (dist <= max_dist) \
            & (dist > 0)
        score = jnp.where(ok, (l16 << 20) - dist, NEG)
        better = score > best_score
        if hunting is not None:
            better = better & hunting
        best_score = jnp.where(better, score, best_score)
        best_cand_s = jnp.where(better, cand, best_cand_s)
    return best_score, best_cand_s


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
              max_lazy: int, nice: int = 258, unit: int = 0,
              strategy: int = 0, good: int = GOOD_L16,
              max_dist: int = WINDOW_SIZE) -> dict:
    """data: (LANE,) uint8. enc_start/enc_end/hist_valid_from: () int32.
    unit > 0 caps matches at `unit`-byte boundaries past enc_start so the
    encoder can emit any unit as an independent block (stored/tree choice
    per unit) with no token crossing into it. Returns per-position token
    info dict (fixed shapes).

    strategy (static) carries the reference's dispatch-by-strategy semantics
    (deflate.c:1036-1043): Z_HUFFMAN_ONLY (2) emits literals only (no
    matching at all, deflate_huff.c); Z_RLE (3) restricts matching to the
    distance-1 run prepass (deflate_rle.c); Z_FILTERED (1) drops matches
    shorter than 6 (deflate.c match_length <= 5 filter)."""
    Z_FILTERED_, Z_HUFFMAN_ONLY_, Z_RLE_ = 1, 2, 3
    use_probes = strategy not in (Z_HUFFMAN_ONLY_, Z_RLE_)
    use_runs = strategy != Z_HUFFMAN_ONLY_
    min_keep = 6 if strategy == Z_FILTERED_ else MIN_MATCH

    N = data.shape[0]
    pos = jnp.arange(N, dtype=I32)
    # columns needed for extension: 4 bytes per column, +1 column of slack
    n_ext = min(nice, MAX_MATCH)
    CX = (n_ext + 3) // 4 + 1
    pad = jnp.concatenate([data, jnp.zeros(4 * CX + 12, jnp.uint8)])
    w4 = _build_w4(pad)                      # (N + 4*CX + 9,)

    if use_probes:
        # hash of 4 bytes at each position — w4 already holds exactly that
        # little-endian word (zero-extended tail matches _hash4's)
        h = ((w4[:N] * U32(HASH_MULT)) >> U32(16)).astype(I32)

        # ---- candidates via one stable sort ----------------------------
        # TPU design: all candidate comparisons happen between entries
        # ADJACENT in (hash, pos) sorted order, so they are array *shifts*,
        # not gathers. The probe rows ride ALONG the sort as extra
        # operands: XLA's batched sort moves payload columns at sequential
        # bandwidth, while the old post-sort w2[order] row gather paid
        # point-gather cost (measured 62 ms -> ~4 ms per 16x160K group).
        # Longer probes break winner ties that chain-order heuristics get
        # wrong (measured: ≈2% ratio for 16B vs 4B). Do NOT narrow the
        # probes for chain <= 2: L1's nice (16) fits inside the 16-byte
        # probe, so W=4 makes the probe length EXACT and the whole wide-
        # extension stage statically disappears (n_ext <= N_PROBE below) —
        # measured: W=2 re-enabled extension and cost L1 ~25% throughput
        # and ~13% ratio on text.
        W = PROBE_WORDS
        ws = [w4[4 * i: N + 4 * i] for i in range(W)]
        sorted_ops = jax.lax.sort((h, pos) + tuple(ws), dimension=0,
                                  num_keys=2)
        h_sorted, pos_s = sorted_ops[0], sorted_ops[1]
        w2_s = jnp.stack(sorted_ops[2:], axis=1)            # (N, W)
        # inverse permutation by scatter (O(N)) — a second argsort would
        # pay the full bitonic-network cost again just to invert
        inv = jnp.zeros(N, I32).at[pos_s].set(pos)

        NEG = jnp.int32(-(1 << 30))
        dense = min(chain, DENSE_PROBES)
        # the deflateTune `good` knob (match_tpl.h:84-88 chain quartering):
        # after GATE_DEPTH probes, rows whose best probe already reaches
        # `good` bytes stop improving — deeper dense passes still run (pure
        # shifted compares) but their updates are masked for settled rows,
        # matching the compacted path's hunt gate semantics exactly.
        GATE_DEPTH = 16
        good_l16 = max(4, min(good, 4 * W))
        if jax.default_backend() == "tpu" and N % 128 == 0:
            # fused kernel: all dense shifted compares run in VMEM — one
            # HBM read of the probe planes instead of one per pass
            from .probe_pallas import probe_best_pallas
            best_score, best_cand_s = probe_best_pallas(
                w2_s, h_sorted, pos_s, hist_valid_from,
                dense, GATE_DEPTH, good_l16, max_dist=max_dist)
        else:
            best_score, best_cand_s = _probe_best_xla(
                w2_s, h_sorted, pos_s, hist_valid_from,
                dense, GATE_DEPTH, good_l16, max_dist=max_dist)

        if chain > dense:
            # ---- compacted deep probes (k = dense+1 .. chain) ----------
            # Same-hash runs are contiguous in sorted order, so a row has a
            # (dense+1)-th same-hash predecessor iff h_sorted matches at
            # shift dense+1. Rows that (a) still hunt, (b) can emit, and
            # (c) have deeper candidates are compacted into M-row batches;
            # each batch gathers its query/candidate probe rows once per k.
            sidx = jnp.arange(N, dtype=I32)
            kd = dense + 1
            has_deeper = jnp.concatenate(
                [jnp.zeros(kd, bool), h_sorted[kd:] == h_sorted[:-kd]])
            good_l16 = max(4, min(good, 16))
            cur_l16 = jnp.where(best_score > NEG,
                                (best_score + (pos_s - best_cand_s)) >> 20, 0)
            need = (has_deeper & (cur_l16 < good_l16)
                    & (pos_s >= enc_start) & (pos_s < enc_end))
            rank = jnp.cumsum(need.astype(I32)) - 1
            total = jnp.sum(need.astype(I32))
            M = max(N // 8, 1024)

            def deep_body(state):
                i, bscore, bcand = state
                lo = i * M
                in_win = need & (rank >= lo) & (rank < lo + M)
                slot = jnp.where(in_win, rank - lo, M)
                idx = jnp.full(M, N - 1, I32).at[slot].set(sidx, mode="drop")
                live = jnp.zeros(M, bool).at[slot].set(in_win, mode="drop")
                # dead slots scatter out-of-range (dropped) so a duplicate
                # of a live row's index can never clobber its update
                widx = jnp.where(live, idx, N)
                qrow = w2_s[idx]                      # (M, W) row gather
                qh = h_sorted[idx]
                qpos = pos_s[idx]
                bs = jnp.where(live, bscore[idx], jnp.int32(1 << 30))
                bc = bcand[idx]
                for k in range(dense + 1, chain + 1):
                    cidx = jnp.maximum(idx - k, 0)
                    crow = w2_s[cidx]                 # (M, W) row gather
                    x = qrow ^ crow
                    l16 = _ctz_bytes32(x[:, W - 1])
                    for w in range(W - 2, -1, -1):
                        l16 = jnp.where(x[:, w] != 0,
                                        _ctz_bytes32(x[:, w]), 4 + l16)
                    cpos = pos_s[cidx]
                    dist = qpos - cpos
                    ok = (qh == h_sorted[cidx]) & (cpos >= hist_valid_from) \
                        & (dist <= max_dist) & (dist > 0) & (idx - k >= 0)
                    score = jnp.where(ok, (l16 << 20) - dist, NEG)
                    better = score > bs
                    bs = jnp.where(better, score, bs)
                    bc = jnp.where(better, cpos, bc)
                bscore = bscore.at[widx].set(bs, mode="drop")
                bcand = bcand.at[widx].set(bc, mode="drop")
                return i + 1, bscore, bcand

            _, best_score, best_cand_s = jax.lax.while_loop(
                lambda st: st[0] * M < total, deep_body,
                (jnp.int32(0), best_score, best_cand_s))

        # pack (valid, l16, cand), map back to position order with ONE
        # gather (cand < N needs pos_bits bits, l16 <= 16 -> 5 more; -1 =
        # none; 5 + pos_bits must stay < 31)
        pos_bits = max(17, (N - 1).bit_length())
        valid_s = best_score > NEG
        l16_s = (best_score + (pos_s - best_cand_s)) >> 20   # probe length
        packed_s = jnp.where(valid_s, (l16_s << pos_bits) | best_cand_s,
                             jnp.int32(-1))
        packed = packed_s[inv]                               # point gather
        has_cand = packed >= 0
        best_cand = jnp.where(has_cand, packed & ((1 << pos_bits) - 1), 0)
        l16 = jnp.where(has_cand, packed >> pos_bits, 0)
        best_dist = jnp.where(has_cand, pos - best_cand, 0)
    else:
        has_cand = jnp.zeros(N, bool)
        best_cand = jnp.zeros(N, I32)
        l16 = jnp.zeros(N, I32)
        best_dist = jnp.zeros(N, I32)

    # ---- extension: two-phase narrow/wide (compare256 analog) ----------
    # The 16-byte probe already yields the EXACT match length whenever the
    # first mismatch falls inside it. Only positions whose probe matched in
    # full (~0.03-13% measured on jpg/text/pdf corpora) need the wide
    # columnar compare; those are compacted into fixed-size batches of M
    # and extended inside a while_loop, so cost is proportional to the
    # data's long-match density instead of a dense (N, CX) row gather.
    N_PROBE = 4 * PROBE_WORDS
    if n_ext <= N_PROBE:
        ext = l16                                        # probe is exact
    else:
        # only positions that can emit tokens need exact lengths: this
        # excludes the 32K history prefix, zero tail padding, and all-zero
        # padded lanes (whose every position would otherwise probe-match)
        need = (has_cand & (l16 >= N_PROBE)
                & (pos >= enc_start) & (pos < enc_end))
        rank = jnp.cumsum(need.astype(I32)) - 1          # rank among needy
        total = jnp.sum(need.astype(I32))
        M = max(N // 8, 1024)
        # W[i, c] = word at byte i+4c — shift/stack, no data movement
        W = jnp.stack([w4[4 * c: 4 * c + N] for c in range(CX)], axis=1)

        def wide_body(state):
            i, ext = state
            lo = i * M
            in_win = need & (rank >= lo) & (rank < lo + M)
            slot = jnp.where(in_win, rank - lo, M)
            idx = jnp.full(M, N, I32).at[slot].set(pos, mode="drop")
            live = idx < N
            safe = jnp.where(live, idx, 0)
            csafe = jnp.where(live, best_cand.at[safe].get(), 0)
            X = W[safe] ^ W[csafe]                       # (M, CX) row gathers
            nzcol = jnp.where(X != 0, jnp.arange(CX, dtype=I32)[None, :], CX)
            fc = jnp.min(nzcol, axis=1)
            word_fc = jnp.where(nzcol == fc[:, None], X, 0).sum(axis=1)
            ext_c = 4 * fc + _ctz_bytes32(word_fc.astype(U32))
            return i + 1, ext.at[idx].set(ext_c, mode="drop")

        _, ext = jax.lax.while_loop(
            lambda st: st[0] * M < total, wide_body, (jnp.int32(0), l16))
    cap = jnp.minimum(MAX_MATCH, enc_end - pos)
    if unit > 0:  # stop at the next unit boundary (block-choice granule)
        cap = jnp.minimum(cap, unit - ((pos - enc_start) % unit))
    blen = jnp.minimum(jnp.minimum(ext, n_ext), cap)
    blen = jnp.where(has_cand, blen, 0)

    # dist-1 run prepass (exact long runs; the probe truncates them at the
    # extension cap): distance-to-next-inequality via reversed cummin
    if use_runs:
        eq = jnp.concatenate([data[1:] == data[:-1], jnp.zeros(1, bool)])
        falses = jnp.where(~eq, pos, N)
        next_false = jax.lax.cummin(falses[::-1])[::-1]
        run_pairs = next_false - pos
        prev_eq = jnp.concatenate([jnp.zeros(1, bool), eq[:-1]])
        run_ok = prev_eq & (pos - 1 >= hist_valid_from)
        run_len = jnp.where(run_ok, 1 + run_pairs, 0)
        run_len = jnp.minimum(jnp.minimum(run_len, MAX_MATCH),
                              cap).astype(I32)
        use_run = run_len > blen
        blen = jnp.where(use_run, run_len, blen)
        best_dist = jnp.where(use_run, 1, best_dist)

    # ---- minimum / too-far filters -------------------------------------
    # (exact cost-based match demotion happens later, in stage 2, once the
    # block's real Huffman tables exist — ops/deflate_tpu.py)
    ok = (blen >= min_keep) & ~((blen == MIN_MATCH) & (best_dist > TOO_FAR))
    blen = jnp.where(ok, blen, 0)
    best_dist = jnp.where(ok, best_dist, 0)

    # ---- lazy decision (deflate_slow 1-step rule); the serial chain walk
    # itself runs in the parse kernel (ops/parse_pallas.py)
    if lazy:
        nxt_len = jnp.concatenate([blen[1:], jnp.zeros(1, I32)])
        defer = (nxt_len > blen) & (blen < max_lazy)
    else:
        defer = jnp.zeros(N, bool)
    take = (blen >= MIN_MATCH) & ~defer
    step = jnp.where(take, blen, 1)
    return dict(step=step, take=take, blen=blen, bdist=best_dist)


def finalize_tokens(lanes: jnp.ndarray, outs: dict, sel: jnp.ndarray) -> dict:
    """Batch-level token materialization once the parse mask is known.
    lanes: (B, N) uint8; outs: lz77_lane dict fields (B, N); sel: (B, N)."""
    is_match = sel & outs["take"] & (outs["blen"] > 0)
    tok_len = jnp.where(is_match, outs["blen"], 0)
    tok_dist = jnp.where(is_match, outs["bdist"], 0)
    lsym = jnp.where(is_match, length_code_arith(jnp.maximum(tok_len, 3)),
                     lanes.astype(I32))
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
# one-hot MXU helpers: histograms and table lookups without point gathers
# ---------------------------------------------------------------------------
def onehot_i8(sym: jnp.ndarray, width: int) -> jnp.ndarray:
    """(N,) int32 -> (N, width) int8 one-hot (VPU compare, feeds the MXU)."""
    return (sym[:, None] == jnp.arange(width, dtype=I32)[None, :]).astype(jnp.int8)


def lookup_via_onehot(oh: jnp.ndarray, tables: jnp.ndarray) -> jnp.ndarray:
    """Table lookup as an int8 matmul: tables (width, M) int32 with values
    < 2^16 are nibble-split so every operand fits signed int8 exactly.
    Returns (N, M) int32."""
    width, M = tables.shape
    nibs = jnp.concatenate(
        [((tables >> (4 * j)) & 0xF).astype(jnp.int8) for j in range(4)], axis=1)
    r = jnp.matmul(oh, nibs, preferred_element_type=I32)     # (N, 4*M)
    out = r[:, :M]
    for j in range(1, 4):
        out = out | (r[:, j * M:(j + 1) * M] << (4 * j))
    return out


def lookup2d(sym: jnp.ndarray, tables: jnp.ndarray, hi_bins: int) -> jnp.ndarray:
    """Wide-table lookup via the nibble factorization: sym = 16*a + b, one
    (N, hi_bins) f32 one-hot contracted against the (hi_bins, 16*M) table,
    then a 16-way masked reduction picks the b column. Exact for values
    < 2^24 (f32 integer range). vs a (N, bins) one-hot this materializes
    ~16x less and contracts bins/16 x fewer MACs. Returns (N, M) int32."""
    bins, M = tables.shape
    pad = hi_bins * 16 - bins
    T = jnp.concatenate([tables, jnp.zeros((pad, M), tables.dtype)]) \
        if pad else tables
    a = (sym >> 4).astype(I32)
    b = (sym & 15).astype(I32)
    oha = (a[:, None] == jnp.arange(hi_bins, dtype=I32)).astype(jnp.float32)
    # HIGHEST precision: TPU matmuls default to bf16 operands, whose 8-bit
    # mantissa cannot represent 15-bit table values exactly
    R = jnp.matmul(oha, T.reshape(hi_bins, 16 * M).astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    R = R.reshape(-1, 16, M)
    ohb = (b[:, None] == jnp.arange(16, dtype=I32)).astype(jnp.float32)
    return jnp.sum(R * ohb[:, :, None], axis=1).astype(I32)


def _hist2d(sym: jnp.ndarray, w: jnp.ndarray, hi_bins: int) -> jnp.ndarray:
    """Weighted histogram of `sym` (..., N) into hi_bins*16 bins as a
    nibble-factored batched matmul: sym = 16*a + b decomposes the one-hot
    into (N, hi_bins) x (N, 16) factors, so materialized operands shrink
    16x vs a full (N, bins) one-hot (37 MB per 128K lane at 288 bins)
    while the MXU contraction count stays the same. Returns (..., bins)."""
    a = (sym >> 4).astype(I32)
    b = (sym & 15).astype(I32)
    oha = (a[..., None] == jnp.arange(hi_bins, dtype=I32)).astype(jnp.int8)
    ohb = (b[..., None] == jnp.arange(16, dtype=I32)).astype(jnp.int8)
    h2 = jnp.einsum("...na,...nb->...ab", oha * w[..., None], ohb,
                    preferred_element_type=I32)
    return h2.reshape(*sym.shape[:-1], hi_bins * 16)


def lane_freqs(lsym: jnp.ndarray, dsym: jnp.ndarray, sel: jnp.ndarray,
               is_match: jnp.ndarray):
    """Histogram lit/len syms (286) and dist syms (30) for selected tokens —
    nibble-factored MXU matmuls, no scatter-add."""
    lfreq = _hist2d(lsym, sel.astype(jnp.int8), 18)
    dfreq = _hist2d(dsym, (sel & is_match).astype(jnp.int8), 2)
    return lfreq[:286], dfreq[:30]


def unit_freqs(lsym: jnp.ndarray, dsym: jnp.ndarray, sel: jnp.ndarray,
               is_match: jnp.ndarray, hist: int, unit: int, q: int):
    """Per-unit token histograms. Units are contiguous `unit`-byte ranges
    of the payload (tokens never cross unit boundaries — lz77_lane unit
    cap), so binning is a reshape to (q, unit) + batched nibble-factored
    histogram. Returns (q,286), (q,30)."""
    lsq = lsym[hist:].reshape(q, unit)
    dsq = dsym[hist:].reshape(q, unit)
    seq = sel[hist:].reshape(q, unit)
    imq = (sel & is_match)[hist:].reshape(q, unit)
    lfreq = _hist2d(lsq, seq.astype(jnp.int8), 18)
    dfreq = _hist2d(dsq, imq.astype(jnp.int8), 2)
    return lfreq[:, :286], dfreq[:, :30]
