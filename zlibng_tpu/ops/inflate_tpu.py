"""TPU batch DEFLATE decoder — the device inflate path.

TPU-first re-design of the reference's inflate hot loop
(inffast_tpl.h:53-298 + chunkset_tpl.h): instead of a byte-serial state
machine, decoding is two array phases (the design sketched in SURVEY §7
Stage 1, after the massively-parallel-decompression literature):

  phase A — token resolution. For EVERY bit position of a Huffman block,
      speculatively decode one token with a flat 15-bit LUT (the flattened
      analog of the reference's two-level root/sub tables, see
      huffman/decode_tables.py): a handful of vectorized gathers yields
      (symbol, length, dist, bits-consumed) per position. The true token
      starts are the orbit of the block's first bit under
      p -> p + consumed(p) — exactly the chain walk the encoder already
      has as a Pallas kernel (ops/parse_pallas.py): on TPU the walk is a
      VMEM scalar loop, on CPU a pointer-doubling scan. EOB/invalid
      positions get a giant step so the walk self-terminates; the EOB bit
      position falls out of the selected set (this is how the device
      discovers block boundaries without a host symbol loop).

  phase B — LZ77 reconstruction. Tokens (literal / match / stored-run)
      expand to per-output-byte source pointers: byte j of a match copies
      from absolute position j - dist. Pointer-doubling (log2(n) rounds of
      ptr = ptr[ptr]) resolves every chain of overlapping copies to a
      literal/stored/dictionary root, then ONE gather materializes the
      output. This replaces the reference's CHUNKCOPY/CHUNKMEMSET
      overlap-tolerant serial copies (chunkset_tpl.h:23-283).

Host keeps only the format-tiny serial parts: block headers and dynamic
table construction (inftrees analog, µs per block) and stored-block
bookkeeping. Any stream the batch path cannot or should not handle
(corruption — for exact zlib error messages —, pathological block sizes)
falls back to the serial conformance decoder (stream/inflate_serial.py),
so behavior is always format-exact.

Reference parity notes: strict distance validation ("invalid distance too
far back", inffast_tpl.h:198-227) is enforced in phase B against the
dictionary/window; invalid length/dist symbols (286/287, 30/31) and
invalid LUT entries are flagged in phase A (inflate.c:940-1107 error
cases).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..errors import DataError as InflateError
from ..format.constants import DIST_BASE, LENGTH_BASE
from ..stream.inflate_serial import (
    _S_BLOCK_HEADER, _S_HUFF, _S_STORED, NEED_INPUT, RawInflater,
)
from .parse_pallas import parse_select

I32 = jnp.int32

# phase A token kinds
K_LIT = 0
K_MATCH = 1
K_EOB = 2
K_INVALID = 3
# phase B token kinds (host-side accumulation)
B_LIT = 0
B_MATCH = 1
B_STORED = 2

_LB_J = jnp.asarray(LENGTH_BASE.astype(np.int32))
_DB_J = jnp.asarray(DIST_BASE.astype(np.int32))

# lane size buckets (compressed bytes per lane). A typical dynamic block is
# well under 64 KiB compressed; monster blocks fall back to serial.
_CB_BUCKETS = (1 << 11, 1 << 14, 1 << 15, 1 << 17)
_DPAD = 1 << 15          # dictionary/window prefix region in phase B
_BIG = 1 << 26           # chain-terminating step


class _Fallback(Exception):
    """Internal: this stream needs the serial conformance path."""


# ---------------------------------------------------------------------------
# phase A — batched speculative token resolution
# ---------------------------------------------------------------------------
def _build_flat_luts(tabs, masks, lut_cap: int):
    """Device-side flat LUT construction from the canonical description
    (_canon_tables packing, (B, 48+nsyms) i32). For every peek value the
    code length is found by 15 vectorized canonical-range compares (no
    gathers), then ONE symtab gather yields the symbol: the 2^maxlen flat
    table never crosses the host link, and decode keeps its one-gather-
    per-symbol hot path. Entries are sym<<4|len, -16 invalid — identical
    to the host zng_fill_lut layout."""
    counts = tabs[:, 0:16]
    first = tabs[:, 16:32]
    index = tabs[:, 32:48]
    symtab = tabs[:, 48:]
    nsyms = symtab.shape[1]
    B = tabs.shape[0]
    p = jnp.arange(lut_cap, dtype=I32)[None, :]
    # bit-reverse the low 15 bits of p (the first-received bit becomes the
    # code's MSB)
    rev = p
    rev = ((rev & 0x5555) << 1) | ((rev >> 1) & 0x5555)
    rev = ((rev & 0x3333) << 2) | ((rev >> 2) & 0x3333)
    rev = ((rev & 0x0F0F) << 4) | ((rev >> 4) & 0x0F0F)
    rev = ((rev & 0x00FF) << 8) | ((rev >> 8) & 0x00FF)
    rev15 = rev >> 1                                   # 16-bit rev -> 15
    w = jax.lax.population_count(masks)[:, None]       # (B, 1) table width
    rev_w = rev15 >> (15 - w)
    best_l = jnp.zeros((B, lut_cap), I32)
    best_off = jnp.zeros((B, lut_cap), I32)
    found = jnp.zeros((B, lut_cap), bool)
    for l in range(1, 16):
        c = rev_w >> jnp.clip(w - l, 0, 15)
        off = c - first[:, l:l + 1]
        valid = (off >= 0) & (off < counts[:, l:l + 1]) & (l <= w)
        take = valid & ~found
        best_l = jnp.where(take, l, best_l)
        best_off = jnp.where(take, index[:, l:l + 1] + off, best_off)
        found = found | take
    sym = jnp.take_along_axis(symtab, jnp.clip(best_off, 0, nsyms - 1),
                              axis=1)
    return jnp.where(found, (sym << 4) | best_l, -16)


@functools.partial(jax.jit, static_argnames=("cb", "lit_cap", "dist_cap"))
def _phase_a(comp, byte_starts, lit_tabs, dist_tabs, start_bits, lit_masks,
             dist_masks, cb, lit_cap=1 << 15, dist_cap=1 << 15):
    """comp (C,) u8 — the WHOLE padded compressed stream, uploaded once per
    decode (and shared with phase B); lanes of `cb` bytes are sliced
    in-graph at byte_starts (B,). lit_tabs/dist_tabs are _canon_tables
    packings ((B, 336)/(B, 78) i32) from which the flat variable-width
    LUTs (the inftrees.c:30-295 analog) are built ON DEVICE
    (_build_flat_luts), sized lit_cap/dist_cap to the wave's widest table;
    only peeks masked by lit_masks[b]/dist_masks[b] are read per lane.
    start_bits (B,) i32 bit offset of the first symbol within its lane.
    Returns per-lane compacted token arrays (kind i8; aux u32 packed
    length<<16|dist for matches, symbol for literals — 5 B/token on the
    host link instead of 16), counts, and the first EOB/invalid token's
    (index, kind, end-bit) found on device so the host fetches scalars,
    not the (B, T_CAP) end array. Transfer economics drove all of this:
    the axon host link measures ~10 MB/s, and per-wave flat-LUT uploads
    alone were 2 MB in the old layout (~1 KiB of canonical tables now).

    Peeks are on-demand 32-bit word reads (w32[p>>3] >> (p&7)) instead of
    a materialized (B, N-bits) peek matrix: the 32-bit word at a symbol's
    byte covers its code (<=15 bits) plus length extras (<=5) from any bit
    offset (15+5+7 <= 32), so the literal/length half needs NO dynamic
    gather at all — only the distance code/extras (starting <=20 bits in)
    read through two word gathers."""
    B = byte_starts.shape[0]
    CB = cb
    lane_bytes = jax.vmap(
        lambda s: jax.lax.dynamic_slice(comp, (s,), (CB,)))(byte_starts)
    lit_luts = _build_flat_luts(lit_tabs, lit_masks, lit_cap)
    dist_luts = _build_flat_luts(dist_tabs, dist_masks, dist_cap)
    N = CB * 8
    T_CAP = N // 4
    U32_ = jnp.uint32

    # LE 32-bit word at every BYTE offset (4 shifted adds per byte)
    lb = jnp.pad(lane_bytes, ((0, 0), (0, 8))).astype(U32_)
    w32 = (lb[:, :CB] | (lb[:, 1:CB + 1] << 8) | (lb[:, 2:CB + 2] << 16)
           | (lb[:, 3:CB + 3] << 24))                       # (B, CB)
    CBP = CB + 2
    w32p = jnp.pad(w32, ((0, 0), (0, 2)))                   # guard gathers

    pos = jnp.arange(N, dtype=I32)[None, :]
    r = (pos & 7).astype(U32_)
    # dense per-bit 22-bit window: broadcast each byte's word to its 8 bit
    # offsets (reshape, no gather), shift by the in-byte offset
    wd = (jnp.repeat(w32, 8, axis=1) >> r).astype(I32)

    # literal/length decode at every position (one LUT gather, masked to
    # each lane's table width)
    ent = jnp.take_along_axis(lit_luts, wd & lit_masks[:, None],
                              axis=1).astype(I32)
    nb = ent & 15
    sym = ent >> 4
    invalid = ent < 0
    is_eob = sym == 256
    is_len = sym > 256
    invalid = invalid | (sym > 285)

    # length base/extra: sym 257..285 -> LENGTH_BASE/extra-bit count;
    # extras sit at bit nb of the SAME dense window (nb+e_l <= 20 < 32-7)
    i_l = jnp.clip(sym - 257, 0, 28)
    e_l = jnp.where(i_l >= 28, 0, jnp.clip((i_l - 4) >> 2, 0, 5))
    lext = (wd >> nb) & ((1 << e_l) - 1)
    length = jnp.take(_LB_J, i_l) + lext

    # distance decode at the post-length position: one word gather for the
    # dist code, one for its extras (e_d <= 13 can cross the first word)
    q = pos + nb + e_l
    wq = jnp.take_along_axis(w32p, jnp.minimum(q >> 3, CBP - 1), axis=1)
    dpk = (wq >> (q & 7).astype(U32_)).astype(I32) & dist_masks[:, None]
    dent = jnp.take_along_axis(dist_luts, dpk, axis=1).astype(I32)
    dnb = dent & 15
    dsym = dent >> 4
    invalid = invalid | (is_len & ((dent < 0) | (dsym > 29)))
    i_d = jnp.clip(dsym, 0, 29)
    e_d = jnp.clip((i_d - 2) >> 1, 0, 13)
    q2 = q + dnb
    wq2 = jnp.take_along_axis(w32p, jnp.minimum(q2 >> 3, CBP - 1), axis=1)
    dext = (wq2 >> (q2 & 7).astype(U32_)).astype(I32) & ((1 << e_d) - 1)
    dist = jnp.take(_DB_J, i_d) + dext

    consumed = jnp.where(is_len, nb + e_l + dnb + e_d, nb)
    step = jnp.where(invalid | is_eob, _BIG, jnp.maximum(consumed, 1))

    # chain walk from the first symbol bit: Pallas on TPU, doubling on CPU
    bounds = jnp.stack([start_bits, jnp.full(B, N, I32)], axis=1)
    sel = parse_select(step, bounds)

    kind = jnp.where(invalid, K_INVALID,
                     jnp.where(is_eob, K_EOB,
                               jnp.where(is_len, K_MATCH, K_LIT)))
    # packed payload: match -> length<<16 | dist (length <= 258,
    # dist <= 32768 both fit 16 bits); literal -> symbol
    packed = jnp.where(is_len, (length << 16) | dist, sym).astype(jnp.uint32)
    tend = pos + consumed

    # in-order compaction: rank-scatter into fixed-size token arrays
    rank = jnp.cumsum(sel, axis=1) - 1
    sidx = jnp.where(sel, rank, T_CAP)

    def compact(v, idx):
        return jnp.zeros(T_CAP, v.dtype).at[idx].set(v, mode='drop')

    tok_kind = jax.vmap(compact)(kind.astype(jnp.int8), sidx)
    tok_aux = jax.vmap(compact)(packed, sidx)
    tok_end = jax.vmap(compact)(tend, sidx)
    ntok = sel.sum(axis=1)
    # first EOB/invalid token per lane, resolved on device: the host only
    # ever reads end[] at this one index
    tk_i32 = tok_kind.astype(I32)
    iota = jnp.arange(T_CAP, dtype=I32)[None, :]
    spec_idx = jnp.min(jnp.where(tk_i32 >= K_EOB, iota, T_CAP), axis=1)
    safe = jnp.minimum(spec_idx, T_CAP - 1)
    spec_kind = jnp.take_along_axis(tk_i32, safe[:, None], axis=1)[:, 0]
    spec_end = jnp.take_along_axis(tok_end, safe[:, None], axis=1)[:, 0]
    return tok_kind, tok_aux, ntok, spec_idx, spec_kind, spec_end


# ---------------------------------------------------------------------------
# phase B — LZ77 reconstruction via pointer doubling
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("out_cap",))
def _phase_b(kind, aux, olen, comp, dictv, dict_len, wsize, out_cap):
    """kind/aux/olen (T,) i32 tokens (B_LIT value / B_MATCH dist /
    B_STORED comp-byte-offset; olen = emitted bytes). comp (C,) u8 padded
    compressed bytes (for stored runs); dictv (32768,) u8 right-aligned
    dictionary. Returns (out (out_cap,) u8, bad_dist flag)."""
    T = kind.shape[0]
    real = olen > 0
    csum = jnp.cumsum(olen)
    starts = _DPAD + csum - olen                     # exclusive prefix sum
    total = _DPAD + csum[-1]

    # per-output-byte token id: scatter-add block starts, prefix-sum
    inc = jnp.zeros(out_cap, I32).at[
        jnp.where(real, starts, out_cap)].add(1, mode='drop')
    tid = jnp.cumsum(inc) - 1
    tidc = jnp.clip(tid, 0, T - 1)
    j = jnp.arange(out_cap, dtype=I32)
    k = jnp.take(kind, tidc)
    a = jnp.take(aux, tidc)
    st = jnp.take(starts, tidc)
    in_data = (j >= _DPAD) & (tid >= 0) & (j < total)
    ofs = j - st

    is_m = in_data & (k == B_MATCH)
    src = j - a
    bad = is_m & ((src < _DPAD - dict_len) | (a > wsize))

    v_sto = jnp.take(comp, jnp.clip(a + ofs, 0, comp.shape[0] - 1)).astype(I32)
    # dictv is right-aligned in a 32768-byte buffer and _DPAD == 32768, so
    # output position j < _DPAD maps one-to-one onto dictv[j]
    v_dict = jnp.take(dictv, jnp.clip(j, 0, dictv.shape[0] - 1)).astype(I32)
    val = jnp.where(j < _DPAD, v_dict, jnp.where(k == B_LIT, a, v_sto))

    ptr = jnp.where(is_m, jnp.clip(src, 0, out_cap - 1), j)

    # pointer doubling to fixpoint: chains shrink quadratically, and most
    # copy chains resolve in far fewer than the log2(out_cap) worst-case
    # rounds — the convergence test (one reduction) is cheaper than the
    # guaranteed-dead extra gather rounds
    def _cond(st):
        return st[1]

    def _body(st):
        p, _ = st
        nxt = jnp.take(p, p)
        return nxt, jnp.any(nxt != p)

    ptr, _ = jax.lax.while_loop(_cond, _body, (ptr, jnp.bool_(True)))
    out = jnp.take(val, ptr).astype(jnp.uint8)
    return out, bad.any()


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------
class _Cursor:
    """Per-segment decode state for the wave engine."""

    __slots__ = ("pos", "end_bit", "toks", "done", "bucket", "total_out",
                 "final")

    def __init__(self, start_bit: int, end_bit: int | None):
        self.pos = start_bit         # absolute bit position in comp
        self.end_bit = end_bit       # segment bound (full-flush boundary)
        self.toks = []               # list of (kind, aux, olen) np arrays
        self.done = False
        self.bucket = 0
        self.total_out = 0
        self.final = False           # current block's BFINAL


def _canon_tables(lengths: np.ndarray, nsyms: int) -> tuple[np.ndarray, int]:
    """Canonical-code description of one Huffman table, packed for the
    device LUT builder: [counts(16) | first(16) | index(16) | symtab] i32.
    symtab = symbols sorted by (length, symbol); first/index are the RFC
    1951 3.2.2 canonical first-code and symbol-base per length. Returns
    (packed (48 + nsyms,) i32, max_len). ~1 KiB per block on the host
    link instead of the 2^maxlen flat LUT (up to 128 KiB)."""
    ln = lengths[:nsyms]
    counts = np.bincount(ln, minlength=16)[:16].astype(np.int64)
    counts[0] = 0
    first = np.zeros(16, np.int64)
    index = np.zeros(16, np.int64)
    code = 0
    idx = 0
    for l in range(1, 16):
        first[l] = code
        index[l] = idx
        idx += counts[l]
        code = (code + counts[l]) << 1
    used = np.nonzero(ln > 0)[0]
    order = used[np.argsort(ln[used], kind="stable")]
    symtab = np.zeros(nsyms, np.int64)
    symtab[:order.size] = order
    w = int(ln.max()) if used.size else 1
    return np.concatenate([counts, first, index, symtab]).astype(np.int32), w


@functools.lru_cache(maxsize=4)
def _fixed_canon():
    """Canonical descriptions of the RFC fixed trees."""
    lit = np.zeros(288, np.int32)
    lit[0:144] = 8
    lit[144:256] = 9
    lit[256:280] = 7
    lit[280:288] = 8
    dist = np.full(30, 5, np.int32)
    return _canon_tables(lit, 288), _canon_tables(dist, 30)


def _parse_header(inf: RawInflater, cur: _Cursor):
    """Parse one block header at cur.pos using the shared host parser.
    Returns ('stored', start_byte, length) | ('huff', lit_tabs, dist_tabs,
    (wl, wd), sym_start_bit) where *_tabs are _canon_tables packings (the
    device rebuilds the flat LUTs in-graph). Raises InflateError exactly
    as inflate does."""
    inf.bitpos = cur.pos
    inf.state = _S_BLOCK_HEADER
    inf._last_lengths = None
    r = inf._read_block_header(finish=True)
    if r is NEED_INPUT:
        raise InflateError("unexpected end of stream")
    cur.final = inf.final_block
    if inf.state == _S_STORED:
        start_byte = inf.bitpos >> 3
        length = inf.stored_remaining
        if start_byte + length > len(inf.data):
            raise InflateError("unexpected end of stream")
        cur.pos = inf.bitpos + 8 * length
        return ("stored", start_byte, length)
    assert inf.state == _S_HUFF
    if inf._last_lengths is None:          # fixed (btype 1) block
        (lt, wl), (dt, wd) = _fixed_canon()
        return ("huff", lt, dt, (wl, wd), inf.bitpos)
    lengths, hlit, hdist = inf._last_lengths
    lt, wl = _canon_tables(lengths[:hlit], hlit)
    dt, wd = _canon_tables(lengths[hlit:hlit + hdist], hdist)
    return ("huff", lt, dt, (wl, wd), inf.bitpos)


def _advance_host(inf: RawInflater, cur: _Cursor):
    """Advance through stored blocks/headers until a Huffman block needs the
    device (returns its header tuple) or the segment is done (returns None)."""
    while not cur.done:
        if cur.end_bit is not None and cur.pos >= cur.end_bit:
            cur.done = True
            break
        hdr = _parse_header(inf, cur)
        if hdr[0] == "stored":
            _, start_byte, length = hdr
            if length:
                cur.toks.append((np.int32([B_STORED]), np.int32([start_byte]),
                                 np.int32([length])))
                cur.total_out += length
            if cur.final:
                cur.done = True
            continue
        return hdr
    return None


def _accept_tokens(cur: _Cursor, kind_row, aux_row, ntok, spec_idx,
                   spec_kind, spec_end, t_cap: int,
                   base_bit: int, real_bits: int) -> bool:
    """Interpret one lane's phase-A output (kind i8 + packed aux u32 rows,
    fetched only up to the wave's longest consumed prefix; the first
    special token's index/kind/end arrive as device-computed scalars).
    Returns True if the block was fully decoded (cursor advanced), False
    to retry with a bigger lane."""
    n = int(ntok)
    if n >= t_cap:
        return False                     # token-array saturation: go bigger
    s = int(spec_idx)
    if s >= n:                           # no EOB/invalid among real tokens
        if real_bits < 4 * t_cap:        # lane already covers stream end
            raise _Fallback                # no EOB before end: corrupt
        return False                     # block larger than lane: go bigger
    if spec_kind == K_INVALID:
        raise _Fallback                    # exact error via serial re-run
    eob_end = int(spec_end)
    if eob_end > real_bits:
        raise _Fallback                    # EOB read past true end: truncated
    if s:
        k = kind_row[:s].astype(np.int32)
        packed = aux_row[:s].astype(np.int64)
        is_lit = k == K_LIT
        aux = np.where(is_lit, packed, packed & 0xFFFF).astype(np.int32)
        olen = np.where(is_lit, 1, packed >> 16).astype(np.int32)
        cur.toks.append((k, aux, olen))
        cur.total_out += int(olen.sum())
    cur.pos = base_bit + eob_end
    if cur.final:
        cur.done = True
    return True


def _phase_a_default(comp_j, byte_starts, lits, dists, start_bits,
                     lit_masks, dist_masks, cb, lit_cap, dist_cap):
    """Single-device phase A dispatch. Fetches the tiny per-lane scalars
    first, then ONE bulk fetch of the kind/aux prefixes actually consumed
    (the (B, T_CAP) caps are ~5x the typical token count)."""
    tk, ta, nt, si, sk, se = _phase_a(
        comp_j, jnp.asarray(byte_starts), jnp.asarray(lits),
        jnp.asarray(dists), jnp.asarray(start_bits), jnp.asarray(lit_masks),
        jnp.asarray(dist_masks), cb, lit_cap, dist_cap)
    nt_n = np.asarray(nt)
    si_n = np.asarray(si)
    sk_n = np.asarray(sk)
    se_n = np.asarray(se)
    used = np.where((si_n < nt_n) & (sk_n == K_EOB), si_n, 0)
    mx = int(used.max()) if used.size else 0
    if mx > 0:
        tk_n = np.asarray(tk[:, :mx])
        ta_n = np.asarray(ta[:, :mx])
    else:
        B = nt_n.shape[0]
        tk_n = np.zeros((B, 0), np.int8)
        ta_n = np.zeros((B, 0), np.uint32)
    return tk_n, ta_n, nt_n, si_n, sk_n, se_n


def _decode_segments(comp: bytes, seg_bounds, dictionary: bytes | None,
                     wsize: int, phase_a_fn=None, phase_b_fn=None):
    """Decode independent raw-deflate segments of `comp`. seg_bounds is a
    list of (start_bit, end_bit | None); a segment ends at its final block
    or at end_bit (a full-flush boundary — such segments have no final
    block). The dictionary applies to the first segment only (full-flush
    resets history). Returns (outputs, end_bits).

    phase_a_fn/phase_b_fn inject alternative device dispatches (the
    mesh-sharded steps in parallel/sharded.py); None = single-device.
    phase_b_fn, when given, receives batched (S, T) token arrays padded to
    one common (t_cap, out_cap) and returns (outs (S, out_cap), bad (S,))."""
    comp_np = np.frombuffer(comp, np.uint8)
    parser = RawInflater()
    parser.feed(comp)
    cursors = [_Cursor(s, e) for s, e in seg_bounds]
    max_bucket = len(_CB_BUCKETS) - 1
    # a block never outlives its segment, so start each cursor at the
    # bucket that covers the segment's compressed size — the old
    # start-at-smallest policy burned one full (dispatch + fetch) wave per
    # undersized bucket before any token landed
    for cur in cursors:
        seg_bytes = (((cur.end_bit if cur.end_bit is not None
                       else 8 * len(comp)) - cur.pos) + 7) // 8
        while cur.bucket < max_bucket \
                and _CB_BUCKETS[cur.bucket] < seg_bytes:
            cur.bucket += 1
    if phase_a_fn is None:
        phase_a_fn = _phase_a_default

    # the compressed stream goes up ONCE, shared by every phase-A wave
    # (lanes are sliced on device) and by phase B's stored-run gathers
    comp_cap = max(2048, 1 << (len(comp) - 1).bit_length()) if comp else 2048
    comp_pad = np.zeros(comp_cap, np.uint8)
    comp_pad[:len(comp)] = comp_np
    comp_j = jnp.asarray(comp_pad)

    while True:
        # host: headers + stored blocks; collect lanes needing the device
        pend = []
        for cur in cursors:
            if cur.done:
                continue
            hdr = _advance_host(parser, cur)
            if hdr is not None:
                pend.append((cur, hdr))
        if not pend:
            break

        # batch by bucket size
        by_bucket = {}
        for cur, hdr in pend:
            by_bucket.setdefault(cur.bucket, []).append((cur, hdr))
        for bucket, group in by_bucket.items():
            cb = min(_CB_BUCKETS[bucket], comp_cap)
            B = len(group)
            Bpad = 1 << (B - 1).bit_length()
            # device LUT build size: the wave's widest table (pow2 bucket)
            lit_cap = dist_cap = 512
            for _, (_, _lt, _dt, (wl, wd), _) in group:
                lit_cap = max(lit_cap, 1 << wl)
                dist_cap = max(dist_cap, 1 << wd)
            lits = np.zeros((Bpad, 48 + 288), np.int32)
            dists = np.zeros((Bpad, 48 + 30), np.int32)
            byte_starts = np.zeros(Bpad, np.int32)
            start_bits = np.zeros(Bpad, np.int32)
            # default mask 0 for padding lanes (reads only entry 0)
            lit_masks = np.zeros(Bpad, np.int32)
            dist_masks = np.zeros(Bpad, np.int32)
            meta = []
            for i, (cur, (_, lit, dist, (wl, wd), sym_bit)) in enumerate(group):
                base_byte = min(sym_bit >> 3, comp_cap - cb)
                lits[i, :lit.size] = lit
                dists[i, :dist.size] = dist
                lit_masks[i] = (1 << wl) - 1
                dist_masks[i] = (1 << wd) - 1
                byte_starts[i] = base_byte
                start_bits[i] = sym_bit - 8 * base_byte
                real = 8 * (min(len(comp) - base_byte, cb))
                meta.append((cur, 8 * base_byte, real))
            tk, ta, nt, si_, sk, se = phase_a_fn(
                comp_j, byte_starts, lits, dists, start_bits,
                lit_masks, dist_masks, cb, lit_cap, dist_cap)
            for i, (cur, base_bit, real_bits) in enumerate(meta):
                ok = _accept_tokens(cur, tk[i], ta[i], nt[i], si_[i], sk[i],
                                    se[i], 2 * cb, base_bit, real_bits)
                if not ok:
                    if cur.bucket >= max_bucket \
                            or _CB_BUCKETS[cur.bucket] >= comp_cap:
                        raise _Fallback      # pathological block size
                    cur.bucket += 1

    # phase B
    dict_bytes = (dictionary or b"")[-32768:]
    dictv = np.zeros(1 << 15, np.uint8)
    if dict_bytes:
        dictv[-len(dict_bytes):] = np.frombuffer(dict_bytes, np.uint8)
    dictv_j = jnp.asarray(dictv)

    return _phase_b_batched(cursors, dict_bytes, comp_j, dictv_j, wsize,
                            phase_b_fn or _phase_b_default)


def _phase_b_default(kinds, auxs, olens, comp_j, dictv_j, dict_lens, wsize,
                     out_cap):
    """Single-device batched phase B: ONE dispatch for all segments (the
    old per-segment loop paid a full tunnel round trip each), one bulk
    fetch of the output region past the window pad."""
    out, bad = _phase_b_multi(
        jnp.asarray(kinds), jnp.asarray(auxs), jnp.asarray(olens),
        comp_j, dictv_j, jnp.asarray(dict_lens),
        jnp.int32(wsize), out_cap)
    return np.asarray(out[:, _DPAD:]), np.asarray(bad)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def _phase_b_multi(kinds, auxs, olens, comp, dictv, dict_lens, wsize,
                   out_cap):
    out, bad = jax.vmap(
        lambda k, a, o, dl: _phase_b(k, a, o, comp, dictv, dl, wsize,
                                     out_cap))(kinds, auxs, olens, dict_lens)
    return out, bad


def _phase_b_batched(cursors, dict_bytes, comp_j, dictv_j, wsize,
                     phase_b_fn):
    """Batched phase B: all segments padded to one (t_cap, out_cap) and
    reconstructed in a single (sharded) dispatch."""
    live = [(si, cur) for si, cur in enumerate(cursors) if cur.toks]
    outputs = [b""] * len(cursors)
    end_bits = [cur.pos for cur in cursors]
    if live:
        t_cap = max(1 << 10, 1 << max(
            (sum(len(t[0]) for t in cur.toks) - 1).bit_length()
            for _, cur in live))
        out_cap = 1 << int(np.ceil(np.log2(
            _DPAD + max(cur.total_out for _, cur in live) + 1)))
        S = len(live)
        kinds = np.zeros((S, t_cap), np.int32)
        auxs = np.zeros((S, t_cap), np.int32)
        olens = np.zeros((S, t_cap), np.int32)
        dlens = np.zeros(S, np.int32)
        for j, (si, cur) in enumerate(live):
            kind = np.concatenate([t[0] for t in cur.toks])
            kinds[j, :len(kind)] = kind
            auxs[j, :len(kind)] = np.concatenate([t[1] for t in cur.toks])
            olens[j, :len(kind)] = np.concatenate([t[2] for t in cur.toks])
            dlens[j] = len(dict_bytes) if si == 0 else 0
        outs, bads = phase_b_fn(kinds, auxs, olens, comp_j, dictv_j, dlens,
                                wsize, out_cap)
        if bool(np.asarray(bads).any()):
            raise _Fallback
        # contract: outs rows are numpy, starting AT the data (the _DPAD
        # window-pad region is sliced off device-side before the fetch)
        for j, (si, cur) in enumerate(live):
            outputs[si] = outs[j][:cur.total_out].tobytes()
    return outputs, end_bits


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------
# Above this size, an unindexed single stream decodes on the host engine:
# without known segment boundaries the device path must round-trip once per
# DEFLATE block (the boundary is data-dependent), so per-dispatch latency
# dominates. This is the DFLTCC routing seam (deflate.c:72-106 precedent:
# pick the best engine per stream, keep the API identical) — indexed /
# multi-segment inputs batch many blocks per dispatch and stay on device.
_DEVICE_SINGLE_MAX = 1 << 20

# Routing/result counters (bench.py asserts device_ok > 0 after its decode
# pass so a silent everything-falls-back regression cannot ship again).
stats = {"device_ok": 0, "fallback": 0, "host_routed": 0, "mesh_ok": 0,
         "error": 0}


def inflate_raw_tpu(data: bytes, wbits: int = 15,
                    dictionary: bytes | None = None, engine: str = "auto",
                    start: int = 0):
    """One-shot raw inflate of data[start:]. Returns (out, bits_consumed
    past start).

    engine: "auto" routes large unindexed streams to the native host hot
    loop and keeps small ones on the device batch path; "device"/"host"
    force a path. Falls back to the serial conformance decoder on any
    anomaly so errors and messages are always format-exact (inflate.c
    error strings)."""
    from ..trace import trace

    data = bytes(data)
    if engine == "host" or (engine == "auto"
                            and len(data) - start > _DEVICE_SINGLE_MAX):
        from ..stream.inflate_serial import inflate_raw
        stats["host_routed"] += 1
        trace("inflate route=host engine=%s comp_bytes=%d", engine,
              len(data) - start)
        return inflate_raw(data, wbits=wbits, dictionary=dictionary,
                           start=start)
    if start:
        data = data[start:]
    try:
        outs, ends = _decode_segments(data, [(0, None)], dictionary,
                                      1 << wbits)
        stats["device_ok"] += 1
        trace("inflate route=device comp_bytes=%d out_bytes=%d", len(data),
              len(outs[0]))
        return outs[0], ends[0]
    except (_Fallback, InflateError):
        from ..stream.inflate_serial import inflate_raw
        stats["fallback"] += 1
        trace("inflate route=fallback comp_bytes=%d", len(data))
        return inflate_raw(data, wbits=wbits, dictionary=dictionary)


def decompress_tpu(data: bytes, wbits: int = 15,
                   dictionary: bytes | None = None,
                   engine: str = "auto") -> bytes:
    """zlib.decompress-compatible one-shot: handles zlib/gzip/raw/auto
    framing like stream/inflate.decompress and routes the DEFLATE payload
    through the engine picked by `engine` (see inflate_raw_tpu)."""
    from ..format.headers import NeedMoreInput
    try:
        return _decompress_tpu(data, wbits=wbits, dictionary=dictionary,
                               engine=engine)
    except NeedMoreInput:  # truncated header on the one-shot surface
        raise InflateError("unexpected end of stream") from None


def _decompress_tpu(data: bytes, wbits: int = 15,
                    dictionary: bytes | None = None,
                    engine: str = "auto") -> bytes:
    import struct

    from ..checksum.adler32 import adler32
    from ..checksum.crc32 import crc32
    from ..format import headers as H

    data = bytes(data)
    if wbits < 0:
        out, _ = inflate_raw_tpu(data, wbits=-wbits, dictionary=dictionary,
                                 engine=engine)
        return out

    if wbits >= 32:
        from ..format.constants import GZIP_MAGIC
        wbits = (wbits & 15) + (16 if data[:2] == GZIP_MAGIC else 0)

    if wbits >= 16:
        _, pos = H.parse_gzip_header(data)
        out, bits = inflate_raw_tpu(data, wbits=(wbits - 16) or 15,
                                    engine=engine, start=pos)
        pos += (bits + 7) // 8
        if len(data) < pos + 8:
            raise InflateError("unexpected end of stream")
        expect_crc, expect_isize = struct.unpack("<II", data[pos:pos + 8])
        if crc32(out) != expect_crc:
            raise InflateError("incorrect data check")
        if expect_isize != (len(out) & 0xFFFFFFFF):
            raise InflateError("incorrect length check")
        return out

    hwbits, has_dict, dictid, pos = H.parse_zlib_header(data)
    if has_dict:
        if dictionary is None:
            raise InflateError("preset dictionary needed")
        if adler32(dictionary) != dictid:
            raise InflateError("incorrect dictionary")
    out, bits = inflate_raw_tpu(data, wbits=max(hwbits, 8),
                                dictionary=dictionary if has_dict else None,
                                engine=engine, start=pos)
    pos += (bits + 7) // 8
    if len(data) < pos + 4:
        raise InflateError("unexpected end of stream")
    if adler32(out) != struct.unpack(">I", data[pos:pos + 4])[0]:
        raise InflateError("incorrect data check")
    return out


def decompress_segments_tpu(blob: bytes, start_bytes) -> list[bytes]:
    """Decode independent full-flush segments of a raw stream in one
    batched device pass (segments advance in lockstep waves; each wave is
    one phase-A dispatch over all segments' current blocks) — the
    parallel-decode engine behind parallel/index.decompress_indexed_tpu.
    start_bytes[i] .. start_bytes[i+1] (or stream end) bounds segment i;
    non-final segments end at the full-flush marker, not a final block."""
    blob = bytes(blob)
    starts = list(start_bytes)
    bounds = []
    for i, s in enumerate(starts):
        end = 8 * starts[i + 1] if i + 1 < len(starts) else None
        bounds.append((8 * s, end))
    try:
        outs, _ = _decode_segments(blob, bounds, None, 1 << 15)
        stats["device_ok"] += 1
        return outs
    except (_Fallback, InflateError):
        stats["fallback"] += 1
        from ..stream.inflate_serial import RawInflater
        outs = []
        ends = starts[1:] + [len(blob)]
        for i in range(len(starts)):
            inf = RawInflater()
            inf.feed(blob[starts[i]:ends[i]])
            inf.run(finish=(i == len(starts) - 1))
            outs.append(inf.output())
        return outs
