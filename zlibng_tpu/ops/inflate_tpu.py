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
_CB_BUCKETS = (1 << 11, 1 << 14, 1 << 17)
_DPAD = 1 << 15          # dictionary/window prefix region in phase B
_BIG = 1 << 26           # chain-terminating step


class _Fallback(Exception):
    """Internal: this stream needs the serial conformance path."""


# ---------------------------------------------------------------------------
# phase A — batched speculative token resolution
# ---------------------------------------------------------------------------
@jax.jit
def _phase_a(lane_bytes, lit_luts, dist_luts, start_bits, lit_masks,
             dist_masks):
    """lane_bytes (B, CB) u8; luts (B, 32768) i32 packed sym<<4|nbits (<0
    invalid), only the first lit_masks[b]+1 / dist_masks[b]+1 entries of
    lane b are valid (variable-width tables, the flat analog of
    inftrees.c:30-295 root-bits sizing); start_bits (B,) i32 bit offset of
    the first symbol. Returns compacted per-lane token arrays + counts.

    Peeks are on-demand 32-bit word reads (w32[p>>3] >> (p&7)) instead of
    a materialized (B, N-bits) peek matrix: the 32-bit word at a symbol's
    byte covers its code (<=15 bits) plus length extras (<=5) from any bit
    offset (15+5+7 <= 32), so the literal/length half needs NO dynamic
    gather at all — only the distance code/extras (starting <=20 bits in)
    read through two word gathers. This drops phase A's per-bit cost from
    ~16 peek-build adds + 5 row gathers to ~1 build op + 3 gathers."""
    B, CB = lane_bytes.shape
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
    ent = jnp.take_along_axis(lit_luts, wd & lit_masks[:, None], axis=1)
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
    dent = jnp.take_along_axis(dist_luts, dpk, axis=1)
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
    litlen = jnp.where(is_len, length, sym)
    tend = pos + consumed

    # in-order compaction: rank-scatter into fixed-size token arrays
    rank = jnp.cumsum(sel, axis=1) - 1
    sidx = jnp.where(sel, rank, T_CAP)

    def compact(v, idx):
        return jnp.zeros(T_CAP, v.dtype).at[idx].set(v, mode='drop')

    tok_kind = jax.vmap(compact)(kind, sidx)
    tok_litlen = jax.vmap(compact)(litlen, sidx)
    tok_dist = jax.vmap(compact)(dist, sidx)
    tok_end = jax.vmap(compact)(tend, sidx)
    ntok = sel.sum(axis=1)
    return tok_kind, tok_litlen, tok_dist, tok_end, ntok


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
    for _ in range(max(1, int(np.ceil(np.log2(out_cap))))):
        ptr = jnp.take(ptr, ptr)
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


def _parse_header(inf: RawInflater, cur: _Cursor):
    """Parse one block header at cur.pos using the shared host parser.
    Returns ('stored', start_byte, length) | ('huff', lit_np, dist_np,
    sym_start_bit). Raises InflateError exactly as inflate does."""
    inf.bitpos = cur.pos
    inf.state = _S_BLOCK_HEADER
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
    # Copy the valid (variable-width) prefix of each table: the native
    # parser reuses its LUT buffers across blocks, so the arrays on `inf`
    # alias the NEXT parse by the time lanes are batched for dispatch.
    wl, wd = inf._lut_bits
    lit = np.array(inf.lit_lut[:1 << wl], dtype=np.int32)
    dist = np.array(inf.dist_lut[:1 << wd], dtype=np.int32)
    return ("huff", lit, dist, (wl, wd), inf.bitpos)


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


def _accept_tokens(cur: _Cursor, kind, litlen, dist, end, ntok,
                   base_bit: int, real_bits: int) -> bool:
    """Interpret one lane's phase-A output. Returns True if the block was
    fully decoded (cursor advanced), False to retry with a bigger lane."""
    n = int(ntok)
    t_cap = kind.shape[0]
    if n >= t_cap:
        return False                     # token-array saturation: go bigger
    kinds = kind[:n]
    specials = np.nonzero(kinds >= K_EOB)[0]
    if specials.size == 0:
        if real_bits < 4 * t_cap:        # lane already covers stream end
            raise _Fallback                # no EOB before end: corrupt
        return False                     # block larger than lane: go bigger
    s = int(specials[0])
    if kinds[s] == K_INVALID:
        raise _Fallback                    # exact error via serial re-run
    eob_end = int(end[s])
    if eob_end > real_bits:
        raise _Fallback                    # EOB read past true end: truncated
    if s:
        k = kinds[:s].copy()
        ll = litlen[:s].astype(np.int32)
        dd = dist[:s].astype(np.int32)
        aux = np.where(k == K_LIT, ll, dd)
        olen = np.where(k == K_LIT, 1, ll)
        cur.toks.append((k, aux, olen))
        cur.total_out += int(olen.sum())
    cur.pos = base_bit + eob_end
    if cur.final:
        cur.done = True
    return True


def _phase_a_default(lanes, lits, dists, starts, lit_masks, dist_masks):
    """Single-device phase A dispatch (numpy in/out)."""
    outs = _phase_a(jnp.asarray(lanes), jnp.asarray(lits), jnp.asarray(dists),
                    jnp.asarray(starts), jnp.asarray(lit_masks),
                    jnp.asarray(dist_masks))
    return tuple(np.asarray(o) for o in outs)


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
    if phase_a_fn is None:
        phase_a_fn = _phase_a_default

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
            cb = _CB_BUCKETS[bucket]
            B = len(group)
            Bpad = 1 << (B - 1).bit_length()
            lanes = np.zeros((Bpad, cb), np.uint8)
            lits = np.zeros((Bpad, 1 << 15), np.int32)
            dists = np.zeros((Bpad, 1 << 15), np.int32)
            starts = np.zeros(Bpad, np.int32)
            # default mask 0 for padding lanes (reads only entry 0)
            lit_masks = np.zeros(Bpad, np.int32)
            dist_masks = np.zeros(Bpad, np.int32)
            meta = []
            for i, (cur, (_, lit, dist, (wl, wd), sym_bit)) in enumerate(group):
                base_byte = sym_bit >> 3
                chunk = comp_np[base_byte:base_byte + cb]
                lanes[i, :chunk.size] = chunk
                lits[i, :lit.size] = lit
                dists[i, :dist.size] = dist
                lit_masks[i] = (1 << wl) - 1
                dist_masks[i] = (1 << wd) - 1
                starts[i] = sym_bit - 8 * base_byte
                meta.append((cur, 8 * base_byte, 8 * chunk.size))
            tk, tl, td, te, nt = phase_a_fn(lanes, lits, dists, starts,
                                            lit_masks, dist_masks)
            for i, (cur, base_bit, real_bits) in enumerate(meta):
                ok = _accept_tokens(cur, tk[i], tl[i], td[i], te[i], nt[i],
                                    base_bit, real_bits)
                if not ok:
                    if cur.bucket >= max_bucket:
                        raise _Fallback      # pathological block size
                    cur.bucket += 1

    # phase B
    dict_bytes = (dictionary or b"")[-32768:]
    dictv = np.zeros(1 << 15, np.uint8)
    if dict_bytes:
        dictv[-len(dict_bytes):] = np.frombuffer(dict_bytes, np.uint8)
    comp_cap = max(1024, 1 << (len(comp) - 1).bit_length()) if comp else 1024
    comp_pad = np.zeros(comp_cap, np.uint8)
    comp_pad[:len(comp)] = comp_np
    dictv_j = jnp.asarray(dictv)
    comp_j = jnp.asarray(comp_pad)

    if phase_b_fn is not None:
        return _phase_b_batched(cursors, dict_bytes, comp_j, dictv_j, wsize,
                                phase_b_fn)

    outputs, end_bits = [], []
    for si, cur in enumerate(cursors):
        if not cur.toks:
            outputs.append(b"")
            end_bits.append(cur.pos)
            continue
        kind = np.concatenate([t[0] for t in cur.toks])
        aux = np.concatenate([t[1] for t in cur.toks])
        olen = np.concatenate([t[2] for t in cur.toks])
        t_cap = max(1 << 10, 1 << (len(kind) - 1).bit_length())
        pad = t_cap - len(kind)
        if pad:
            z = np.zeros(pad, np.int32)
            kind, aux, olen = (np.concatenate([kind, z]),
                               np.concatenate([aux, z]),
                               np.concatenate([olen, z]))
        out_cap = 1 << int(np.ceil(np.log2(_DPAD + cur.total_out + 1)))
        dlen = len(dict_bytes) if si == 0 else 0
        out, bad = _phase_b(jnp.asarray(kind), jnp.asarray(aux),
                            jnp.asarray(olen), comp_j, dictv_j,
                            np.int32(dlen), np.int32(wsize), out_cap)
        if bool(bad):
            raise _Fallback                  # exact message via serial path
        outputs.append(np.asarray(out)[_DPAD:_DPAD + cur.total_out].tobytes())
        end_bits.append(cur.pos)
    return outputs, end_bits


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
        for j, (si, cur) in enumerate(live):
            outputs[si] = np.asarray(
                outs[j])[_DPAD:_DPAD + cur.total_out].tobytes()
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
stats = {"device_ok": 0, "fallback": 0, "host_routed": 0, "mesh_ok": 0}


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
