"""Multi-chip sharded compression over a jax.sharding.Mesh.

The reference is single-threaded; its format-level parallelism enablers
(independent blocks, checksum combine, full-flush boundaries — SURVEY §2.10)
become real data-parallelism here:

  * lanes (64 KiB payload + 32 KiB history) shard across the mesh 'd' axis
  * every chip runs the full LZ77+Huffman+bitpack pipeline on its lanes
    (fixed trees in-graph — no host round-trip inside the step)
  * compressed lengths are exchanged with an all_gather (the length half of
    the ragged ordered gather; payload gather happens at assembly)
  * adler32 partials merge with the closed-form combine as a log-tree —
    exact, matching adler32_combine (reference adler32.c:32-55)

`make_compress_step` returns a jitted SPMD step usable on any mesh shape;
`dryrun` in __graft_entry__ drives it on a virtual CPU mesh.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map_mod  # newer jax
    shard_map = jax.shard_map
except Exception:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..errors import DataError as InflateError
from ..format.constants import (
    ADLER_BASE, FIXED_DIST_CODES_REV, FIXED_DIST_LENGTHS, FIXED_LIT_CODES_REV,
    FIXED_LIT_LENGTHS,
)
from ..ops.bitpack_jax import render_body_tokens
from ..ops.bitpack_merge import hierarchical_pack
from ..ops.lz77_jax import lz77_lane

I32 = jnp.int32
U32 = jnp.uint32


def _adler_combine_pair(a: jnp.ndarray, b: jnp.ndarray, len2: jnp.ndarray):
    """Device adler32_combine (closed form, all uint32 mod arithmetic)."""
    base = U32(ADLER_BASE)
    rem = (len2 % base).astype(U32)
    s1a, s2a = a & U32(0xFFFF), (a >> 16) & U32(0xFFFF)
    s1b, s2b = b & U32(0xFFFF), (b >> 16) & U32(0xFFFF)
    s1 = (s1a + s1b + base - 1) % base
    s2 = (s2a + s2b + (rem * s1a) % base + base - rem) % base
    return (s2 << 16) | s1


def _mod_tree(x: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """Pairwise mod-base tree sum of values < base (never overflows u32)."""
    while x.shape[0] > 1:
        half = (x.shape[0] + 1) // 2
        x = jnp.pad(x, (0, 2 * half - x.shape[0]))
        x = (x[:half] + x[half:]) % base
    return x[0]


def _lane_adler(lane: jnp.ndarray, enc_start: jnp.ndarray, enc_end: jnp.ndarray):
    """Adler32 of the payload slice of one lane (masked, uint32).

    Chunk-local weight decomposition: the total weighted sum
    sum(b_i * (enc_end - pos_i)) is split per 2048-byte chunk into a
    chunk-local part (weights <= 2048, so the chunk sum <= 255*2048^2 < 2^31)
    plus csum_c * ((enc_end - chunk_end_c) mod base), with both factors
    reduced mod base first (65520^2 < 2^32). The global-weight form
    (b * (w mod base)) overflows uint32 at 255*65520*2048 ~ 3.4e10 — the
    same reason the reference blocks adler at NMAX (adler32_p.h:11-13).
    Mirrors ops/checksum_jax._adler32_device.
    """
    N = lane.shape[0]
    CH = 2048
    Np = -(-N // CH) * CH
    base = U32(ADLER_BASE)
    pos = jnp.arange(N, dtype=I32)
    m = (pos >= enc_start) & (pos < enc_end)
    b = jnp.where(m, lane, 0).astype(U32)
    if Np != N:
        b = jnp.pad(b, (0, Np - N))
    bs = b.reshape(-1, CH)
    csum = bs.sum(axis=1) % base                       # < base after mod
    wloc = U32(CH) - jnp.arange(CH, dtype=U32)         # chunk_end - pos, 1..CH
    wsum = (bs * wloc[None, :]).sum(axis=1) % base     # <= 255*CH^2/.. < 2^31
    nch = Np // CH
    chunk_end = (jnp.arange(nch, dtype=I32) + 1) * I32(CH)
    trailing = ((enc_end - chunk_end) % I32(ADLER_BASE)).astype(U32)
    t = (wsum + (csum * trailing) % base) % base
    s1 = (U32(1) + _mod_tree(csum, base)) % base
    n = (enc_end - enc_start).astype(U32)
    s2 = (_mod_tree(t, base) + n % base) % base
    return (s2 << 16) | s1


def make_compress_step(mesh: Mesh, lane_size: int, out_max: int,
                       chain: int = 4, lazy: bool = True, max_lazy: int = 16,
                       axis: str = "d"):
    """Build a jitted SPMD compression step over `mesh`.

    Step signature: (lanes (B, lane_size) u8, enc_starts, enc_ends,
    hist_valids (B,) i32) ->
      packed (B, out_max) u8, total_bits (B,) i32,
      all_bits (B,) i32 (globally gathered lengths, replicated),
      adler (n_dev,) u32 per-shard payload checksums (combinable).
    B must be divisible by mesh size.
    """
    lt = jnp.asarray(FIXED_LIT_LENGTHS.astype(np.int32))
    lc = jnp.asarray(FIXED_LIT_CODES_REV.astype(np.int32))
    dt = jnp.asarray(FIXED_DIST_LENGTHS.astype(np.int32))
    dc = jnp.asarray(FIXED_DIST_CODES_REV.astype(np.int32))

    from ..ops.lz77_jax import finalize_tokens
    from ..ops.parse_pallas import parse_select_encode

    def emit_lane(lane, es, ee, tok_len, tok_dist, lsym, dsym, sel):
        lo, hi, nb = render_body_tokens(
            tok_len, tok_dist, lsym, dsym, sel, lt, lc, dt, dc)
        # static block header (BFINAL=0 within shards; finalization is a
        # host-side concern at assembly) + EOB
        hdr_lo = jnp.array([2], U32)   # btype=1 (static): bits 0b10<<1 | 0
        hdr_hi = jnp.zeros(1, U32)
        hdr_nb = jnp.array([3], I32)
        eob_lo = lc[256].astype(U32)[None]
        eob_nb = lt[256].astype(I32)[None]
        lo_all = jnp.concatenate([hdr_lo, lo, eob_lo])
        hi_all = jnp.concatenate([hdr_hi, hi, jnp.zeros(1, U32)])
        nb_all = jnp.concatenate([hdr_nb, nb, eob_nb])
        packed, total = hierarchical_pack(lo_all, hi_all, nb_all, out_max)
        adler = _lane_adler(lane, es, ee)
        return packed, total, adler, (ee - es)

    def shard_fn(lanes, enc_starts, enc_ends, hist_valids):
        core = jax.vmap(lambda l, es, ee, hv: lz77_lane(
            l, es, ee, hv, chain, lazy, max_lazy))(
                lanes, enc_starts, enc_ends, hist_valids)
        bounds = jnp.stack([enc_starts, enc_ends], axis=1)
        sel = parse_select_encode(core["step"], bounds)
        outs = finalize_tokens(lanes, core, sel)
        packed, totals, adlers, lens = jax.vmap(emit_lane)(
            lanes, enc_starts, enc_ends, outs["tok_len"], outs["tok_dist"],
            outs["lsym"], outs["dsym"], outs["sel"])
        # combine this shard's lane checksums sequentially (few lanes/shard)
        def fold(a, x):
            ad, ln = x
            return _adler_combine_pair(a, ad, ln.astype(U32)).astype(jnp.uint32), None
        init = jnp.zeros((), jnp.uint32) + 1
        try:  # inside shard_map the carry must be marked device-varying
            init = jax.lax.pcast(init, (axis,), to="varying")
        except (AttributeError, TypeError):
            pass
        shard_adler, _ = jax.lax.scan(fold, init, (adlers, lens))
        # collectives over ICI: length exchange for the ordered ragged gather
        all_bits = jax.lax.all_gather(totals, axis, tiled=True)
        shard_adler_all = jax.lax.all_gather(shard_adler[None], axis, tiled=True)
        return packed, totals, all_bits, shard_adler_all

    try:
        smapped = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(), P()),
            check_vma=False,
        )
    except TypeError:  # older jax without check_vma
        smapped = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(), P()),
        )
    return jax.jit(smapped)


def combine_shard_adlers(adlers: np.ndarray, shard_payload_lens) -> int:
    """Host-side exact merge of per-shard adler values (ordered)."""
    from ..checksum.adler32 import adler32_combine
    acc = 1
    for a, ln in zip(adlers.tolist(), shard_payload_lens):
        acc = adler32_combine(acc, int(a), int(ln))
    return acc


# ---------------------------------------------------------------------------
# dynamic-Huffman SPMD pipeline (two sharded programs + host tree build)
# ---------------------------------------------------------------------------
def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:  # older jax without check_vma
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)


def make_stage1_step(mesh: Mesh, lane_block: int, hist: int,
                     chain: int = 4, lazy: bool = True,
                     max_lazy: int = 16, nice: int = 258, axis: str = "d",
                     good: int = 12):
    """Sharded stage 1: LZ77 parse + per-lane symbol histograms.

    (flat (ndev, hist + lps*lane_block) u8, enc_starts, enc_ends,
    hist_valids (B,) i32) ->
    (sel (B,L) bool, tok_len/tok_dist (B,L) u16, lfreq (B,286), dfreq (B,30)),
    all sharded on `axis`. Lanes are assembled IN-GRAPH from each shard's
    flat chunk (the 32 K history prefix is duplicated once per SHARD, not
    per lane — the flat-group-upload economics of the single-chip pipeline,
    ops/deflate_tpu.py _stage1). The freqs go to the host, which builds
    each lane's dynamic Huffman table.
    """
    from ..ops.lz77_jax import finalize_tokens, lane_freqs
    from ..ops.parse_pallas import parse_select_encode

    lane_sz = hist + lane_block

    def shard_fn(flat, enc_starts, enc_ends, hist_valids):
        flat = flat[0]                       # (hist + lps*lane_block,)
        lps = enc_starts.shape[0]
        starts = jnp.arange(lps, dtype=I32) * lane_block

        def one(s, es, ee, hv):
            lane = jax.lax.dynamic_slice(flat, (s,), (lane_sz,))
            return lane, lz77_lane(lane, es, ee, hv, chain, lazy, max_lazy,
                                   nice, good=good)

        lanes, core = jax.vmap(one)(starts, enc_starts, enc_ends, hist_valids)
        bounds = jnp.stack([enc_starts, enc_ends], axis=1)
        sel = parse_select_encode(core["step"], bounds)
        outs = finalize_tokens(lanes, core, sel)
        lfreq, dfreq = jax.vmap(lane_freqs)(
            outs["lsym"], outs["dsym"], outs["sel"], outs["tok_len"] > 0)
        return (outs["sel"].astype(bool), outs["tok_len"].astype(jnp.uint16),
                outs["tok_dist"].astype(jnp.uint16), lfreq, dfreq)

    smapped = _shard_map(shard_fn, mesh,
                         (P(axis), P(axis), P(axis), P(axis)),
                         (P(axis), P(axis), P(axis), P(axis), P(axis)))
    return jax.jit(smapped)


def make_stage2_step(mesh: Mesh, out_max: int, lane_block: int, hist: int,
                     axis: str = "d"):
    """Sharded stage 2: render + pack each lane as one DEFLATE block
    against its own (host-built, dynamic or static) code tables, plus the
    length all_gather and adler combine collectives. Lanes are re-assembled
    in-graph from the shard's flat chunk (same economics as stage 1).

    (flat (ndev, hist+lps*lane_block), tok_len, tok_dist, sel,
    hdr_lo/hi/nb (B,HMAX), llen/lcode (B,288), dlen/dcode (B,30),
    enc_starts, enc_ends) ->
    (packed (B,out_max) u8, total_bits (B,), all_bits (B,) replicated,
    shard_adlers (n_dev,) replicated).
    """
    from ..ops.lz77_jax import dist_code_arith, length_code_arith

    lane_sz = hist + lane_block

    def emit_lane(lane, tl, td, se, hlo, hhi, hnb, lt, lc2, dt2, dc2, es, ee):
        tl = tl.astype(I32)
        td = td.astype(I32)
        is_match = tl > 0
        ls = jnp.where(is_match, length_code_arith(jnp.maximum(tl, 3)),
                       lane.astype(I32))
        ds = jnp.where(is_match, dist_code_arith(jnp.maximum(td, 1)), 0)
        lo, hi, nb = render_body_tokens(tl, td, ls, ds, se, lt, lc2, dt2, dc2)
        eob_lo = lc2[256].astype(U32)[None]
        eob_nb = lt[256].astype(I32)[None]
        lo_all = jnp.concatenate([hlo, lo, eob_lo])
        hi_all = jnp.concatenate([hhi, hi, jnp.zeros(1, U32)])
        nb_all = jnp.concatenate([hnb, nb, eob_nb])
        packed, total = hierarchical_pack(lo_all, hi_all, nb_all, out_max)
        adler = _lane_adler(lane, es, ee)
        return packed, total, adler, (ee - es)

    def shard_fn(flat, tok_len, tok_dist, sel, hdr_lo, hdr_hi, hdr_nb,
                 llen, lcode, dlen, dcode, enc_starts, enc_ends):
        flat = flat[0]
        lps = enc_starts.shape[0]
        starts = jnp.arange(lps, dtype=I32) * lane_block
        lanes = jax.vmap(
            lambda s: jax.lax.dynamic_slice(flat, (s,), (lane_sz,)))(starts)
        packed, totals, adlers, lens = jax.vmap(emit_lane)(
            lanes, tok_len, tok_dist, sel, hdr_lo, hdr_hi, hdr_nb,
            llen, lcode, dlen, dcode, enc_starts, enc_ends)

        def fold(a, x):
            ad, ln = x
            return _adler_combine_pair(a, ad, ln.astype(U32)).astype(
                jnp.uint32), None
        init = jnp.zeros((), jnp.uint32) + 1
        try:
            init = jax.lax.pcast(init, (axis,), to="varying")
        except (AttributeError, TypeError):
            pass
        shard_adler, _ = jax.lax.scan(fold, init, (adlers, lens))
        all_bits = jax.lax.all_gather(totals, axis, tiled=True)
        shard_adler_all = jax.lax.all_gather(shard_adler[None], axis,
                                             tiled=True)
        return packed, totals, all_bits, shard_adler_all

    smapped = _shard_map(shard_fn, mesh,
                         (P(axis),) * 13,
                         (P(axis), P(axis), P(), P()))
    return jax.jit(smapped)


def compress_multichip(data: bytes, mesh: Mesh, level: int = 6,
                       lane_block: int = 1 << 16, axis: str = "d",
                       to_dev=None, to_host=None) -> bytes:
    """Full multi-chip zlib compression: lanes shard across the mesh, each
    lane becomes one DEFLATE block with its own dynamic/static tree
    (host-built from device histograms, like the single-chip pipeline),
    host stitches the bit-aligned shards and wraps with the device-combined
    adler32. Output is a standard single-stream zlib member.

    to_dev(arr, spec)/to_host(x) inject the array placement/fetch seam:
    single-host defaults are jnp.asarray/np.asarray; multi-host
    (parallel/multihost.py) passes make_array_from_callback over the global
    mesh and a process_allgather fetch, so the SAME pipeline runs across
    jax.distributed processes (SURVEY §2.10)."""
    from ..format import headers as H
    from ..format.constants import (
        FIXED_DIST_CODES_REV as FDC, FIXED_DIST_LENGTHS as FDL,
        FIXED_LIT_CODES_REV as FLC, FIXED_LIT_LENGTHS as FLL, MAX_BITS,
        WINDOW_SIZE,
    )
    from ..huffman.encode import build_dynamic_header, huffman_table
    from ..ops.deflate_tpu import (
        HMAX, _BitStitcher, _header_tokens_to_arrays,
    )
    from ..stream.deflate import LEVELS

    if to_dev is None:
        to_dev = lambda arr, spec=None: jnp.asarray(arr)  # noqa: E731
    if to_host is None:
        to_host = np.asarray

    from ..ops.deflate_tpu import _est_block_bits_batch
    from ..format.constants import DIST_EXTRA, LENGTH_EXTRA

    ndev = mesh.devices.size
    lc = LEVELS[max(1, min(9, level))]
    buf = np.frombuffer(memoryview(bytes(data)), np.uint8)
    n = buf.size
    hist = WINDOW_SIZE
    nblocks = max(1, -(-n // lane_block))
    B = -(-nblocks // ndev) * ndev            # pad lane count to mesh size
    lps = B // ndev                           # lanes per shard
    vbuf = np.concatenate([np.zeros(hist, np.uint8), buf,
                           np.zeros(B * lane_block - n, np.uint8)])
    # per-SHARD flat chunks: the 32 K history is duplicated once per shard
    # (ndev * 32 K total), not once per lane — lanes assemble in-graph
    flat_len = hist + lps * lane_block
    flat_sh = np.zeros((ndev, flat_len), np.uint8)
    for s in range(ndev):
        base = s * lps * lane_block
        flat_sh[s] = vbuf[base: base + flat_len]
    enc_starts = np.full(B, hist, np.int32)
    enc_ends = np.full(B, hist, np.int32)
    hist_valids = np.full(B, hist, np.int32)  # empty pad lanes: no history
    for bi in range(nblocks):
        enc_ends[bi] = hist + min(lane_block, n - bi * lane_block)
        hist_valids[bi] = hist if bi == 0 else 0
    out_max = lane_block + (lane_block >> 2) + 1024

    s1 = make_stage1_step(mesh, lane_block, hist, lc.chain, lc.lazy,
                          lc.max_lazy, lc.nice, axis=axis, good=lc.good)
    s2 = make_stage2_step(mesh, out_max, lane_block, hist, axis=axis)
    sp = P(axis)
    flat_d = to_dev(flat_sh, sp)
    sel, tok_len, tok_dist, lfreqs_d, dfreqs_d = s1(
        flat_d, to_dev(enc_starts, sp), to_dev(enc_ends, sp),
        to_dev(hist_valids, sp))
    lfreqs = to_host(lfreqs_d).astype(np.int64)
    dfreqs = to_host(dfreqs_d).astype(np.int64)

    # host: vectorized cost prepass + per-lane tree build + three-way
    # stored/static/dynamic choice (trees.c:657-692 / deflate_stored.c:
    # an incompressible lane is emitted as raw stored blocks, not a
    # ~8.004-bit/byte Huffman block)
    plens = (enc_ends - enc_starts).astype(np.int64)          # payload bytes
    lfreqs[:, 256] += 1                                       # EOB per lane
    lext = np.zeros(286, np.int64)
    lext[257:286] = LENGTH_EXTRA[:29]
    dext = DIST_EXTRA[:30].astype(np.int64)
    extra_v = lfreqs @ lext + dfreqs @ dext                   # (B,)
    static_v = lfreqs @ FLL[:286].astype(np.int64) \
        + dfreqs @ FDL.astype(np.int64) + extra_v             # (B,)
    # exact stored cost: per 65535-byte chunk 3-bit header + pad(<=7) + 32
    nchunks = np.maximum(1, -(-plens // 0xFFFF))
    stored_v = 8 * plens + nchunks * (32 + 3 + 7)
    ests = _est_block_bits_batch(lfreqs, dfreqs)              # (B,) float
    # prestored: stored so clearly wins that the tree build is skipped
    prestored = stored_v + 64 < np.minimum(ests, static_v)

    hdr_lo = np.zeros((B, HMAX), np.uint32)
    hdr_hi = np.zeros((B, HMAX), np.uint32)
    hdr_nb = np.zeros((B, HMAX), np.int32)
    llen_tab = np.zeros((B, 288), np.int32)
    lcode_tab = np.zeros((B, 288), np.int32)
    dlen_tab = np.zeros((B, 30), np.int32)
    dcode_tab = np.zeros((B, 30), np.int32)
    stored_mask = np.zeros(B, bool)
    for bi in range(nblocks):
        final = bi == nblocks - 1
        if prestored[bi]:
            stored_mask[bi] = True
            continue
        lfreq = lfreqs[bi]
        dfreq = dfreqs[bi]
        static_bits = int(static_v[bi])
        llen, lcode = huffman_table(lfreq, MAX_BITS)
        dlen, dcode = huffman_table(dfreq, MAX_BITS)
        toks, hbits = build_dynamic_header(llen, dlen)
        dyn_bits = int((lfreq * llen).sum() + (dfreq * dlen).sum()) \
            + int(extra_v[bi]) + hbits
        best = min(static_bits, dyn_bits)
        if int(stored_v[bi]) < best + 3:                      # exact re-choice
            stored_mask[bi] = True
            continue
        if dyn_bits < static_bits:
            tokens = [(int(final) | (2 << 1), 3)] + toks
            llen_tab[bi, :286], lcode_tab[bi, :286] = llen, lcode
            dlen_tab[bi], dcode_tab[bi] = dlen, dcode
        else:
            tokens = [(int(final) | (1 << 1), 3)]
            llen_tab[bi] = FLL
            lcode_tab[bi] = FLC
            dlen_tab[bi, :] = FDL
            dcode_tab[bi, :] = FDC
        hdr_lo[bi], hdr_hi[bi], hdr_nb[bi] = _header_tokens_to_arrays(tokens)

    packed, totals, all_bits, shard_adlers = s2(
        flat_d, tok_len, tok_dist, sel,
        to_dev(hdr_lo, sp), to_dev(hdr_hi, sp), to_dev(hdr_nb, sp),
        to_dev(llen_tab, sp), to_dev(lcode_tab, sp),
        to_dev(dlen_tab, sp), to_dev(dcode_tab, sp),
        to_dev(enc_starts, sp), to_dev(enc_ends, sp))
    packed_np = to_host(packed)
    totals_np = to_host(totals)

    stitch = _BitStitcher()
    for bi in range(nblocks):
        if stored_mask[bi]:
            # raw stored blocks straight from the input (device packed
            # output for this lane is ignored; its adler still counts)
            p0 = hist + bi * lane_block
            plen = int(plens[bi])
            pos = 0
            while True:
                take = min(plen - pos, 0xFFFF)
                last = (bi == nblocks - 1) and (pos + take == plen)
                pad = (8 - ((stitch.bits + 3) & 7)) & 7
                stitch.append_tokens([
                    (int(last), 1), (0, 2), (0, pad),
                    (take, 16), (~take & 0xFFFF, 16)])
                stitch.append(vbuf[p0 + pos: p0 + pos + take], take * 8)
                pos += take
                if pos >= plen:
                    break
        else:
            stitch.append(packed_np[bi], int(totals_np[bi]))
    shard_lens = [int(plens[s * lps:(s + 1) * lps].sum())
                  for s in range(ndev)]
    adler = combine_shard_adlers(np.asarray(shard_adlers), shard_lens)
    return (H.build_zlib_header(wbits=15, level=level) + stitch.getvalue()
            + H.build_zlib_trailer(adler))


# ---------------------------------------------------------------------------
# sharded batch decode (phase A/B over the mesh)
# ---------------------------------------------------------------------------
def make_decode_phase_a(mesh: Mesh, cb: int, lit_cap: int, dist_cap: int,
                        axis: str = "d"):
    """Sharded phase A: speculative token resolution over lanes distributed
    across the mesh (ops/inflate_tpu._phase_a per shard; the compressed
    stream is replicated, per-lane canonical tables/starts shard). Lane
    batch must be divisible by mesh size."""
    from ..ops.inflate_tpu import _phase_a
    core = _phase_a.__wrapped__

    smapped = _shard_map(
        lambda comp, *a: core(comp, *a, cb=cb, lit_cap=lit_cap,
                              dist_cap=dist_cap),
        mesh, (P(),) + (P(axis),) * 6, (P(axis),) * 6)
    return jax.jit(smapped)


def make_decode_phase_b(mesh: Mesh, out_cap: int, axis: str = "d"):
    """Sharded phase B: LZ77 reconstruction of independent segments
    (pointer-doubling resolve + gather), segments sharded across the mesh,
    compressed blob and dictionary replicated."""
    from ..ops.inflate_tpu import _phase_b
    core = _phase_b.__wrapped__

    def shard_fn(kind, aux, olen, comp, dictv, dict_lens, wsize):
        out, bad = jax.vmap(
            lambda k, a, o, dl: core(k, a, o, comp, dictv, dl, wsize[0],
                                     out_cap))(kind, aux, olen, dict_lens)
        return out, bad

    smapped = _shard_map(shard_fn, mesh,
                         (P(axis), P(axis), P(axis), P(), P(), P(axis), P()),
                         (P(axis), P(axis)))
    return jax.jit(smapped)


def decompress_segments_multichip(blob: bytes, start_bytes, mesh: Mesh,
                                  axis: str = "d", to_dev=None,
                                  to_host=None) -> list[bytes]:
    """Sharded analog of ops/inflate_tpu.decompress_segments_tpu: decode
    independent full-flush segments with phase A lanes and phase B segments
    distributed over the mesh. Falls back to the single-device engine only
    on speculative-decode anomalies (`_Fallback`); a real stream error
    (InflateError) PROPAGATES — the mesh path already decoded enough to
    know, and re-decoding a corrupt stream just to re-raise doubles the
    work (reference BAD-state latch, inflate.c:1161-1163).

    to_dev(arr, spec)/to_host(x) inject multi-host array placement/fetch
    (see compress_multichip); defaults are single-host."""
    from ..ops import inflate_tpu as IT

    default_placement = to_dev is None
    if default_placement:
        to_dev = lambda arr, spec=None: jnp.asarray(arr)  # noqa: E731
    if to_host is None:
        to_host = np.asarray

    ndev = mesh.devices.size
    pa_cache: dict[int, object] = {}
    pb_cache: dict[int, object] = {}
    sp = P(axis)
    rp = P()

    def phase_a_pad(comp_j, byte_starts, lits, dists, start_bits, lm, dm,
                    cb, lit_cap, dist_cap):
        B = byte_starts.shape[0]
        Bp = -(-B // ndev) * ndev
        if Bp != B:
            pad = Bp - B

            def padz(x):
                return np.concatenate(
                    [x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            lits, dists = padz(lits), padz(dists)
            byte_starts, start_bits = padz(byte_starts), padz(start_bits)
            lm, dm = padz(lm), padz(dm)
        key = (cb, lit_cap, dist_cap)
        if key not in pa_cache:
            pa_cache[key] = make_decode_phase_a(mesh, cb, lit_cap, dist_cap,
                                                axis=axis)
        if default_placement:
            comp_g = comp_j
        else:  # multi-host: replicate the blob as a global array
            comp_g = to_dev(np.asarray(comp_j), rp)
        outs = pa_cache[key](comp_g, to_dev(byte_starts, sp),
                             to_dev(lits, sp), to_dev(dists, sp),
                             to_dev(start_bits, sp), to_dev(lm, sp),
                             to_dev(dm, sp))
        return tuple(to_host(o)[:B] for o in outs)

    def phase_b_batched(kinds, auxs, olens, comp_j, dictv_j, dict_lens,
                        wsize, out_cap):
        S = kinds.shape[0]
        Sp = -(-S // ndev) * ndev
        if Sp != S:
            pad = Sp - S
            kinds = np.concatenate([kinds, np.zeros((pad,) + kinds.shape[1:],
                                                    kinds.dtype)])
            auxs = np.concatenate([auxs, np.zeros_like(kinds[:pad])])
            olens = np.concatenate([olens, np.zeros_like(kinds[:pad])])
            dict_lens = np.concatenate([dict_lens,
                                        np.zeros(pad, dict_lens.dtype)])
        if out_cap not in pb_cache:
            pb_cache[out_cap] = make_decode_phase_b(mesh, out_cap, axis=axis)
        if default_placement:
            comp_g, dictv_g = comp_j, dictv_j
        else:  # multi-host: replicate the blob/dict as global arrays
            comp_g = to_dev(np.asarray(comp_j), rp)
            dictv_g = to_dev(np.asarray(dictv_j), rp)
        out, bad = pb_cache[out_cap](
            to_dev(kinds, sp), to_dev(auxs, sp), to_dev(olens, sp),
            comp_g, dictv_g, to_dev(dict_lens, sp),
            to_dev(np.full(1, wsize, np.int32), rp))
        # contract: rows start AT the data (window pad sliced off on device)
        return to_host(out[:, IT._DPAD:])[:S], to_host(bad)[:S]

    ran = {"a": False, "b": False}

    def phase_a_traced(*a):
        ran["a"] = True
        return phase_a_pad(*a)

    def phase_b_traced(*a):
        ran["b"] = True
        return phase_b_batched(*a)

    try:
        outs, _ = IT._decode_segments(
            bytes(blob), [(8 * s, 8 * e if e is not None else None)
                          for s, e in _seg_bounds(start_bytes, len(blob))],
            None, 1 << 15, phase_a_traced, phase_b_traced)
        if ran["a"] and ran["b"]:
            IT.stats["mesh_ok"] += 1
        return outs
    except InflateError:
        IT.stats["error"] = IT.stats.get("error", 0) + 1
        raise
    except IT._Fallback:
        IT.stats["fallback"] += 1
        return IT.decompress_segments_tpu(bytes(blob), start_bytes)


def _seg_bounds(start_bytes, blob_len):
    starts = list(start_bytes)
    out = []
    for i, s in enumerate(starts):
        end = starts[i + 1] if i + 1 < len(starts) else None
        out.append((s, end))
    return out
