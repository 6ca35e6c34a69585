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


def _lane_adler(lane: jnp.ndarray, enc_start: jnp.ndarray, enc_end: jnp.ndarray):
    """Adler32 of the payload slice of one lane (masked, uint32)."""
    N = lane.shape[0]
    pos = jnp.arange(N, dtype=I32)
    m = (pos >= enc_start) & (pos < enc_end)
    b = jnp.where(m, lane, 0).astype(U32)
    base = U32(ADLER_BASE)
    # weights: enc_end - pos for payload positions
    w = jnp.where(m, (enc_end - pos).astype(U32) % base, 0)
    # block the modular sums to stay in uint32
    CH = 2048
    bs = b.reshape(-1, CH)
    s1 = (bs.sum(axis=1) % base)
    s2 = ((b * w).reshape(-1, CH).sum(axis=1) % base)
    while s1.shape[0] > 1:
        half = (s1.shape[0] + 1) // 2
        s1 = jnp.pad(s1, (0, 2 * half - s1.shape[0]))
        s2 = jnp.pad(s2, (0, 2 * half - s2.shape[0]))
        s1 = (s1[:half] + s1[half:]) % base
        s2 = (s2[:half] + s2[half:]) % base
    n = (enc_end - enc_start).astype(U32)
    return ((s2[0] + n % base) % base << 16) | (1 + s1[0]) % base


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
    from ..ops.parse_pallas import parse_select

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
        sel = parse_select(core["step"], bounds)
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
