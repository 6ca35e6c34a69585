"""TPU block-parallel DEFLATE encoder — the flagship pipeline.

Orchestration (DFLTCC-style accelerator seam, SURVEY §2.9/§5: hand whole
blocks to the accelerator, keep the zlib framing contract):

  host:   slice input into 64 KiB payload lanes, each with the previous
          32 KiB as read-only history (cross-block window ⇒ same reach as
          the reference's sliding window)
  device: stage 1 — hash/candidates/extension/lazy-parse per lane (vmapped),
          symbol histograms via one-hot MXU matmuls        [ops/lz77_jax.py]
  host:   per-lane Huffman tables + dynamic header descriptor + block-type
          choice (trees.c zng_tr_flush_block analog, numpy, ~µs per lane)
  device: stage 2 — token rendering + bit packing           [ops/bitpack_jax.py]
  host:   bit-level stitch of lane bitstreams + zlib/gzip wrapper; checksums
          via the device kernels (ops/checksum_jax.py)

Compressed output is standard single-stream DEFLATE: block boundaries are
invisible to any inflate implementation.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..checksum.adler32 import adler32
from ..checksum.crc32 import crc32
from ..errors import StreamError
from ..format import headers as H
from ..format.constants import (
    DIST_EXTRA, FIXED_DIST_CODES_REV, FIXED_DIST_LENGTHS, FIXED_LIT_CODES_REV,
    FIXED_LIT_LENGTHS, LENGTH_EXTRA, MAX_BITS, WINDOW_SIZE,
)
from ..huffman.encode import build_dynamic_header, huffman_table
from ..stream.deflate import LEVELS, Z_DEFAULT_STRATEGY, Z_FIXED
from .bitpack_jax import render_body_tokens
from .bitpack_merge import hierarchical_pack
from .lz77_jax import lane_freqs, lz77_lane

LANE_HIST = WINDOW_SIZE          # 32768
LANE_BLOCK = 1 << 16             # 65536 payload bytes per lane
LANE = LANE_HIST + LANE_BLOCK
HMAX = 704                       # max dynamic-header tokens (worst-case RLE)
OUT_MAX = 1 << 17                # per-lane packed output bound (bytes)
MAX_LANES = 32                   # lanes per device call (2 MiB payload)

I32 = jnp.int32
U32 = jnp.uint32


# ---------------------------------------------------------------------------
# jitted stages
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("chain", "lazy", "max_lazy", "nice"))
def _stage1(lanes, enc_ends, hist_valids, chain, lazy, max_lazy, nice=258):
    from .lz77_jax import finalize_tokens
    from .parse_pallas import parse_select

    def one(lane, ee, hv):
        return lz77_lane(lane, jnp.int32(LANE_HIST), ee, hv, chain, lazy,
                         max_lazy, nice)

    core = jax.vmap(one)(lanes, enc_ends, hist_valids)
    B = lanes.shape[0]
    bounds = jnp.stack([jnp.full(B, LANE_HIST, jnp.int32), enc_ends], axis=1)
    sel = parse_select(core["step"], bounds)
    outs = finalize_tokens(lanes, core, sel)
    lfreqs, dfreqs = jax.vmap(lane_freqs)(
        outs["lsym"], outs["dsym"], outs["sel"], outs["tok_len"] > 0)
    # compact the cross-dispatch token arrays: materializing stage outputs
    # costs real HBM bandwidth, and lsym/dsym are recomputable arithmetic
    # functions of (lanes, tok_len, tok_dist) — 5 B/pos instead of 20 B/pos
    compact = dict(sel=outs["sel"].astype(bool),
                   tok_len=outs["tok_len"].astype(jnp.uint16),
                   tok_dist=outs["tok_dist"].astype(jnp.uint16))
    return compact, lfreqs, dfreqs


@jax.jit
def _stage2(lanes, tok_len, tok_dist, sel,
            hdr_lo, hdr_hi, hdr_nb, llen_tab, lcode_tab, dlen_tab, dcode_tab,
            eob_mask):
    from .lz77_jax import dist_code_arith, length_code_arith

    def one(lane, tl, td, se, hlo, hhi, hnb, lt, lc, dt, dc, em):
        tl = tl.astype(I32)
        td = td.astype(I32)
        is_match = tl > 0
        ls = jnp.where(is_match, length_code_arith(jnp.maximum(tl, 3)),
                       lane.astype(I32))
        ds = jnp.where(is_match, dist_code_arith(jnp.maximum(td, 1)), 0)
        lo, hi, nb = render_body_tokens(tl, td, ls, ds, se, lt, lc, dt, dc)
        # EOB is emitted only on the last lane of a merged block group
        eob_lo = (lc[256].astype(U32) * em.astype(U32))[None]
        eob_hi = jnp.zeros(1, U32)
        eob_nb = (lt[256] * em)[None].astype(I32)
        lo_all = jnp.concatenate([hlo, lo, eob_lo])
        hi_all = jnp.concatenate([hhi, hi, eob_hi])
        nb_all = jnp.concatenate([hnb, nb, eob_nb])
        return hierarchical_pack(lo_all, hi_all, nb_all, OUT_MAX)

    return jax.vmap(one)(lanes, tok_len, tok_dist, sel,
                         hdr_lo, hdr_hi, hdr_nb,
                         llen_tab, lcode_tab, dlen_tab, dcode_tab, eob_mask)


# ---------------------------------------------------------------------------
# host helpers
# ---------------------------------------------------------------------------
class _BitStitcher:
    """Accumulate bit-aligned parts into one LSB-first byte stream."""

    def __init__(self):
        self.buf = bytearray()
        self.bits = 0

    def append(self, part: np.ndarray, part_bits: int) -> None:
        if part_bits == 0:
            return
        nb = (part_bits + 7) >> 3
        part = part[:nb].astype(np.uint16)
        r = self.bits & 7
        if r == 0:
            if self.bits >> 3 < len(self.buf):
                self.buf = self.buf[: self.bits >> 3]
            self.buf += part.astype(np.uint8).tobytes()
        else:
            sh = np.zeros(nb + 1, np.uint16)
            sh[:nb] |= (part << r) & 0xFF
            sh[1:] |= part >> (8 - r)
            self.buf[-1] |= int(sh[0])
            self.buf += sh[1:].astype(np.uint8).tobytes()
        self.bits += part_bits
        # trim to exact byte length
        need = (self.bits + 7) >> 3
        if len(self.buf) > need:
            del self.buf[need:]

    def append_tokens(self, tokens: list[tuple[int, int]]) -> None:
        """(value, nbits) pairs rendered on host (tiny: stored headers)."""
        from ..huffman.bitpack import pack_bits
        vals = np.array([v for v, _ in tokens], np.uint64)
        nbs = np.array([n for _, n in tokens], np.int64)
        by, total = pack_bits(vals, nbs)
        self.append(by, total)

    def getvalue(self) -> bytes:
        return bytes(self.buf)


def _header_tokens_to_arrays(tokens: list[tuple[int, int]]):
    """Render header (value,nbits) pairs into padded (HMAX,) lo/hi/nb arrays."""
    lo = np.zeros(HMAX, np.uint32)
    hi = np.zeros(HMAX, np.uint32)
    nb = np.zeros(HMAX, np.int32)
    assert len(tokens) <= HMAX, len(tokens)
    for i, (v, n) in enumerate(tokens):
        lo[i] = v & 0xFFFFFFFF
        hi[i] = (v >> 32) & 0xFFFFFFFF
        nb[i] = n
    return lo, hi, nb


def _extra_cost(lfreq: np.ndarray, dfreq: np.ndarray) -> int:
    lext = np.zeros(286, np.int64)
    lext[257:286] = LENGTH_EXTRA[:29]
    return int((lfreq * lext).sum() + (dfreq * DIST_EXTRA[:30].astype(np.int64)).sum())


# ---------------------------------------------------------------------------
# main entry
# ---------------------------------------------------------------------------
def deflate_payload_tpu(buf: np.ndarray, level: int = 6,
                        strategy: int = Z_DEFAULT_STRATEGY,
                        dictionary: bytes | None = None) -> bytes:
    """Raw DEFLATE payload for `buf` using the TPU pipeline."""
    n = buf.size
    lc = LEVELS[max(1, min(9, level))]
    nblocks = max(1, -(-n // LANE_BLOCK))

    # virtual buffer with 32K zero/dict prefix so every lane slices uniformly
    d = np.frombuffer(memoryview(bytes(dictionary)), np.uint8)[-LANE_HIST:] \
        if dictionary else np.zeros(0, np.uint8)
    prefix = np.concatenate([np.zeros(LANE_HIST - d.size, np.uint8), d])
    tail_pad = np.zeros(nblocks * LANE_BLOCK - n, np.uint8)
    vbuf = np.concatenate([prefix, buf, tail_pad])
    first_hist_valid = LANE_HIST - d.size

    stitch = _BitStitcher()
    lane_starts = [bi * LANE_BLOCK for bi in range(nblocks)]

    # Software pipeline over lane groups: stage1 dispatches are queued ahead
    # so host work (freq fetch, Huffman tree build, stitching) overlaps with
    # device execution of later groups. DEPTH bounds in-flight HBM use.
    DEPTH = 3

    def _dispatch_stage1(g0: int) -> dict:
        g1 = min(g0 + MAX_LANES, nblocks)
        B = g1 - g0
        Bpad = 1 << (B - 1).bit_length()  # bucket to limit recompiles
        lanes = np.zeros((Bpad, LANE), np.uint8)
        enc_ends = np.full(Bpad, LANE_HIST, np.int32)
        hist_valids = np.zeros(Bpad, np.int32)
        for i, bi in enumerate(range(g0, g1)):
            s = lane_starts[bi]
            lanes[i] = vbuf[s:s + LANE]
            enc_ends[i] = LANE_HIST + min(LANE_BLOCK, n - bi * LANE_BLOCK)
            hist_valids[i] = first_hist_valid if bi == 0 else 0
        lanes_d = jnp.asarray(lanes)
        outs, lfreqs_d, dfreqs_d = _stage1(
            lanes_d, jnp.asarray(enc_ends), jnp.asarray(hist_valids),
            lc.chain, lc.lazy, lc.max_lazy, lc.nice)
        return dict(g0=g0, g1=g1, B=B, Bpad=Bpad, lanes_d=lanes_d,
                    outs=outs, lfreqs_d=lfreqs_d, dfreqs_d=dfreqs_d,
                    enc_ends=enc_ends)

    def _dispatch_stage2(gm: dict) -> None:
        g0, g1, B, Bpad = gm["g0"], gm["g1"], gm["B"], gm["Bpad"]
        enc_ends, outs, lanes_d = gm["enc_ends"], gm["outs"], gm["lanes_d"]
        lfreqs = np.asarray(gm["lfreqs_d"])
        dfreqs = np.asarray(gm["dfreqs_d"])

        # host: per-lane table build + type choice + header tokens
        hdr_lo = np.zeros((Bpad, HMAX), np.uint32)
        hdr_hi = np.zeros((Bpad, HMAX), np.uint32)
        hdr_nb = np.zeros((Bpad, HMAX), np.int32)
        llen_tab = np.zeros((Bpad, 288), np.int32)
        lcode_tab = np.zeros((Bpad, 288), np.int32)
        dlen_tab = np.zeros((Bpad, 30), np.int32)
        dcode_tab = np.zeros((Bpad, 30), np.int32)
        stored_mask = np.zeros(Bpad, bool)

        # group consecutive low-token lanes into ONE merged DEFLATE block
        # (shared table, one header, EOB only on the group's last lane) —
        # per-block header overhead otherwise dominates highly compressible
        # corpora (trees.c emits one tree per flush for the same reason)
        tokcnt = lfreqs.sum(axis=1)
        MERGE_TOK = 4096
        groups: list[list[int]] = []
        cur: list[int] = []
        curtok = 0
        for i in range(B):
            small = int(tokcnt[i]) <= MERGE_TOK
            if cur and (not small or curtok + int(tokcnt[i]) > 4 * MERGE_TOK):
                groups.append(cur)
                cur, curtok = [], 0
            if small:
                cur.append(i)
                curtok += int(tokcnt[i])
            else:
                groups.append([i])
        if cur:
            groups.append(cur)

        eob_mask = np.zeros(Bpad, np.int32)
        for grp in groups:
            gfinal = (g0 + grp[-1]) == nblocks - 1
            lfreq = lfreqs[grp].sum(axis=0).astype(np.int64)
            lfreq[256] += 1  # one EOB per merged block
            dfreq = dfreqs[grp].sum(axis=0).astype(np.int64)
            extra = _extra_cost(lfreq, dfreq)
            static_bits = int((lfreq * FIXED_LIT_LENGTHS[:286]).sum()
                              + (dfreq * FIXED_DIST_LENGTHS).sum()) + extra
            if strategy == Z_FIXED:
                dyn_bits = None
            else:
                llen, lcode = huffman_table(lfreq, MAX_BITS)
                dlen, dcode = huffman_table(dfreq, MAX_BITS)
                toks, hbits = build_dynamic_header(llen, dlen)
                dyn_bits = int((lfreq * llen).sum() + (dfreq * dlen).sum()) \
                    + extra + hbits
            best = static_bits if dyn_bits is None else min(static_bits, dyn_bits)
            if len(grp) == 1:
                i = grp[0]
                blen = int(enc_ends[i]) - LANE_HIST
                stored_bits = 32 + 8 * blen + 7  # upper bound incl. alignment
                if blen <= 0xFFFF and stored_bits < best + 3:
                    stored_mask[i] = True
                    continue
            eob_mask[grp[-1]] = 1
            if dyn_bits is not None and dyn_bits < static_bits:
                tokens = [(int(gfinal) | (2 << 1), 3)] + toks
                for i in grp:
                    llen_tab[i, :286], lcode_tab[i, :286] = llen, lcode
                    dlen_tab[i], dcode_tab[i] = dlen, dcode
            else:
                tokens = [(int(gfinal) | (1 << 1), 3)]
                for i in grp:
                    llen_tab[i] = FIXED_LIT_LENGTHS
                    lcode_tab[i] = FIXED_LIT_CODES_REV
                    dlen_tab[i, :] = FIXED_DIST_LENGTHS
                    dcode_tab[i, :] = FIXED_DIST_CODES_REV
            hdr_lo[grp[0]], hdr_hi[grp[0]], hdr_nb[grp[0]] = \
                _header_tokens_to_arrays(tokens)

        packed, totals = _stage2(
            lanes_d, outs["tok_len"], outs["tok_dist"],
            outs["sel"], jnp.asarray(hdr_lo), jnp.asarray(hdr_hi),
            jnp.asarray(hdr_nb), jnp.asarray(llen_tab), jnp.asarray(lcode_tab),
            jnp.asarray(dlen_tab), jnp.asarray(dcode_tab),
            jnp.asarray(eob_mask))
        gm["packed_d"] = packed
        gm["totals_d"] = totals
        gm["stored_mask"] = stored_mask
        # stage1 intermediates are no longer needed on device
        del gm["outs"], gm["lanes_d"], gm["lfreqs_d"], gm["dfreqs_d"]

    def _stitch(gm: dict) -> None:
        packed = np.asarray(gm["packed_d"])
        totals = np.asarray(gm["totals_d"])
        stored_mask, enc_ends = gm["stored_mask"], gm["enc_ends"]
        for i, bi in enumerate(range(gm["g0"], gm["g1"])):
            final = bi == nblocks - 1
            blen = int(enc_ends[i]) - LANE_HIST
            if stored_mask[i]:
                pad = (8 - ((stitch.bits + 3) & 7)) & 7
                stitch.append_tokens([
                    (int(final), 1), (0, 2), (0, pad),
                    (blen, 16), (~blen & 0xFFFF, 16)])
                raw = vbuf[LANE_HIST + bi * LANE_BLOCK:
                           LANE_HIST + bi * LANE_BLOCK + blen]
                stitch.append(raw, blen * 8)
            else:
                stitch.append(packed[i], int(totals[i]))
        del gm["packed_d"], gm["totals_d"]

    inflight: list[dict] = []
    done: list[dict] = []
    for g0 in range(0, nblocks, MAX_LANES):
        inflight.append(_dispatch_stage1(g0))
        if len(inflight) >= DEPTH:
            gm = inflight.pop(0)
            _dispatch_stage2(gm)
            done.append(gm)
        while len(done) >= DEPTH:
            _stitch(done.pop(0))
    for gm in inflight:
        _dispatch_stage2(gm)
        done.append(gm)
    for gm in done:
        _stitch(gm)
    return stitch.getvalue()


def compress_tpu(data, level: int = 6, wbits: int = 15,
                 strategy: int = Z_DEFAULT_STRATEGY,
                 dictionary: bytes | None = None) -> bytes:
    """One-shot TPU compression with zlib/gzip/raw framing."""
    if not (-15 <= wbits <= 31):
        raise StreamError("invalid windowBits")
    buf = np.frombuffer(memoryview(bytes(data)), np.uint8)
    if level == 0 or buf.size < 1024:
        # stored / tiny inputs: host path is faster and identical in format
        from ..stream.deflate import compress as compress_host
        return compress_host(bytes(data), level=level, wbits=wbits,
                             strategy=strategy, dictionary=dictionary)
    payload = deflate_payload_tpu(buf, level, strategy, dictionary)
    if wbits < 0:
        return payload
    if wbits > 15:
        return (H.build_gzip_header(level=level) + payload
                + H.build_gzip_trailer(crc32(buf), buf.size))
    dictid = adler32(dictionary) if dictionary is not None else None
    head = H.build_zlib_header(wbits=max(wbits, 9), level=level, dictid=dictid)
    return head + payload + H.build_zlib_trailer(adler32(buf))
