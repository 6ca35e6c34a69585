"""Device (TPU) bitstream packing.

The jnp mirror of huffman/bitpack.py, reformulated for TPU: instead of a
collision-heavy scatter-add of token bytes, the kernel expands to a bit
array — token start offsets come from one exclusive cumsum, each output bit
finds its covering token via a unique-index scatter + cumulative max (a
segmented broadcast), extracts its bit from the token's 55-bit (lo,hi) u32
pair, and bytes materialize with a (…,8)·[1,2,4,…] contraction. All u32;
no x64. This is the array analog of trees_emit.h's send_bits accumulator.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

U32 = jnp.uint32
I32 = jnp.int32


def render_body_tokens(tok_len, tok_dist, lsym, dsym, sel,
                       lit_lens, lit_codes, dist_lens, dist_codes):
    """Per-position token bit rendering against per-lane code tables.

    lit_lens/lit_codes: (288,) int32 (codes LSB-first); dist_*: (30,).
    Returns (lo u32, hi u32, nbits i32) per position (0 where not selected).
    Table lookups run as one-hot int8 matmuls (MXU) — point gathers of
    98K indices are ~1.6 ms each on TPU, the matmul form is ~10x cheaper.
    """
    from .lz77_jax import (
        dist_extra_arith, length_extra_arith, lookup2d, lookup_via_onehot,
        onehot_i8,
    )

    is_match = tok_len > 0
    lit_tab = jnp.stack([lit_codes.astype(I32), lit_lens.astype(I32)], axis=1)
    lr = lookup2d(lsym, lit_tab, 18)                     # (N, 2)
    code0 = lr[:, 0].astype(U32)
    n0 = lr[:, 1]
    le, lv = length_extra_arith(jnp.maximum(tok_len, 3))
    le = jnp.where(is_match, le, 0)
    lv = jnp.where(is_match, lv, 0).astype(U32)
    ohd = onehot_i8(dsym, 32)
    dist_tab = jnp.stack([
        jnp.concatenate([dist_codes.astype(I32), jnp.zeros(2, I32)]),
        jnp.concatenate([dist_lens.astype(I32), jnp.zeros(2, I32)]),
    ], axis=1)
    dr = lookup_via_onehot(ohd, dist_tab)                # (N, 2)
    dcode = dr[:, 0].astype(U32)
    dn = jnp.where(is_match, dr[:, 1], 0)
    de, dv = dist_extra_arith(jnp.maximum(tok_dist, 1))
    de = jnp.where(is_match, de, 0)
    dv = jnp.where(is_match, dv, 0).astype(U32)

    lo = code0
    hi = jnp.zeros_like(code0)
    sh = n0
    lo, hi = _or_field(lo, hi, lv, sh)
    sh = sh + le
    lo, hi = _or_field(lo, hi, jnp.where(is_match, dcode, U32(0)), sh)
    sh = sh + dn
    lo, hi = _or_field(lo, hi, dv, sh)
    nbits = jnp.where(sel, n0 + le + dn + de, 0)
    lo = jnp.where(sel, lo, 0)
    hi = jnp.where(sel, hi, 0)
    return lo, hi, nbits


def _or_field(lo: jnp.ndarray, hi: jnp.ndarray, val: jnp.ndarray, sh: jnp.ndarray):
    """(lo,hi) |= val << sh for a 55-bit value held as two u32 halves."""
    shc = jnp.minimum(sh, 31).astype(U32)
    lo_part = jnp.where(sh < 32, val << shc, U32(0))
    # hi gets val >> (32 - sh) when sh<32 (sh=0 ⇒ contributes nothing),
    # or val << (sh - 32) when sh >= 32
    shr = jnp.clip(32 - sh, 1, 31).astype(U32)
    hi_lowpart = jnp.where((sh > 0) & (sh < 32), val >> shr, U32(0))
    shl = jnp.clip(sh - 32, 0, 31).astype(U32)
    hi_part = jnp.where(sh >= 32, val << shl, hi_lowpart)
    return lo | lo_part, hi | hi_part


@functools.partial(jax.jit, static_argnames=("out_bytes",))
def pack_lane_bits(lo: jnp.ndarray, hi: jnp.ndarray, nbits: jnp.ndarray,
                   out_bytes: int):
    """Pack one lane's (lo, hi, nbits) token arrays into bytes.

    Returns (bytes (out_bytes,) uint8, total_bits ()).
    """
    T = nbits.shape[0]
    offs = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(nbits)]).astype(I32)
    total = offs[-1]
    starts = offs[:-1]
    OUTBITS = out_bytes * 8

    # covering token per output bit via binary search on the (sorted) start
    # offsets — gathers only, no scatters (TPU scatters serialize). A
    # zero-bit token shares its start with the following nonzero token and
    # side='right' always resolves to the covering (nonzero) one.
    p = jnp.arange(OUTBITS, dtype=I32)
    cov = jnp.searchsorted(starts, p, side="right").astype(I32) - 1
    cov = jnp.clip(cov, 0, T - 1)
    sh = p - starts[cov]
    lo_c = lo[cov]
    hi_c = hi[cov]
    shc = jnp.minimum(sh, 31).astype(U32)
    bit = jnp.where(sh < 32, lo_c >> shc, hi_c >> jnp.clip(sh - 32, 0, 31).astype(U32)) & 1
    bit = jnp.where(sh < nbits[cov], bit, 0)

    weights = (U32(1) << jnp.arange(8, dtype=U32))
    by = (bit.reshape(-1, 8) * weights[None, :]).sum(axis=1).astype(jnp.uint8)
    return by, total
