"""Gather-free device bit packing: hierarchical bitstream merge.

The scan+scatter (or per-bit searchsorted) formulations of DEFLATE bit
packing are point-gather-bound on TPU. This kernel instead treats every
token as a tiny byte-string (≤7 bytes holding ≤55 bits) and concatenates
strings pairwise in log2(T) levels:

    level 0:  T strings of ≤ 8 bytes   (token bits at offset 0 of each cell)
    level s:  T/2^s strings of ≤ min(8·2^s, OUT) bytes
    concat(a, b): shift b left by (len(a) mod 8) bits (elementwise byte
    carry), byte-shift by len(a)//8 via log2(cap) conditional static rolls,
    OR into a's buffer.

Every operation is an elementwise op or a static slice — no gathers, no
scatters, no scans. Total traffic ≈ levels · Σ row bytes ≈ 17 · 8T bytes.

This is the TPU-native replacement for trees_emit.h's sequential 64-bit
send_bits accumulator.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

U8 = jnp.uint8
U32 = jnp.uint32
I32 = jnp.int32


def _bitshift_rows(rows: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Shift each row's LSB-first bitstream left by r (0..7) bits.
    rows: (M, CAP) uint8; r: (M,) int32. Bit k of the stream moves to k+r."""
    rw = rows.astype(U32)
    rr = r.astype(U32)[:, None]
    lo = (rw << rr) & 0xFF
    carry_in = jnp.concatenate(
        [jnp.zeros((rows.shape[0], 1), U32), rw[:, :-1]], axis=1)
    hi = jnp.where(rr > 0, carry_in >> (8 - rr), 0)
    return (lo | hi).astype(U8)


def _byteshift_rows(rows: jnp.ndarray, nbytes: jnp.ndarray, max_shift: int) -> jnp.ndarray:
    """Shift each row right (toward higher indices) by nbytes (0..max_shift)
    bytes using conditional static rolls — log2 passes, no gathers."""
    out = rows
    shift = nbytes.astype(I32)
    k = 1
    while k <= max_shift:
        use = ((shift & k) > 0)[:, None]
        shifted = jnp.concatenate(
            [jnp.zeros((rows.shape[0], k), U8), out[:, :-k]], axis=1)
        out = jnp.where(use, shifted, out)
        k <<= 1
    return out


def hierarchical_pack(lo: jnp.ndarray, hi: jnp.ndarray, nbits: jnp.ndarray,
                      out_bytes: int):
    """Pack (lo, hi, nbits) token arrays (T must be a power of two; pad with
    zero-bit tokens) into one LSB-first byte stream.

    Returns (bytes (out_bytes,) uint8, total_bits ()).
    """
    T = nbits.shape[0]
    Tp = 1 << (T - 1).bit_length()
    if Tp != T:
        z32 = jnp.zeros(Tp - T, lo.dtype)
        lo = jnp.concatenate([lo, z32])
        hi = jnp.concatenate([hi, z32])
        nbits = jnp.concatenate([nbits, jnp.zeros(Tp - T, nbits.dtype)])
        T = Tp
    # defensive: strip any bits at/above nbits (the merge ORs strings
    # together, so stray high bits would corrupt the following token)
    nb_lo = jnp.clip(nbits, 0, 32).astype(U32)
    nb_hi = jnp.clip(nbits - 32, 0, 31).astype(U32)
    lo = jnp.where(nb_lo >= 32, lo, lo & ((U32(1) << nb_lo) - 1))
    hi = hi & ((U32(1) << nb_hi) - 1)

    # level-0 cells: 8 bytes per token from the 55-bit (lo, hi) pair
    b0 = jnp.stack([
        (lo >> 0) & 0xFF, (lo >> 8) & 0xFF, (lo >> 16) & 0xFF, (lo >> 24) & 0xFF,
        (hi >> 0) & 0xFF, (hi >> 8) & 0xFF, (hi >> 16) & 0xFF,
        jnp.zeros_like(lo),
    ], axis=1).astype(U8)                      # (T, 8)
    lens = nbits.astype(I32)                   # (T,)

    rows = b0
    cap = 8
    while rows.shape[0] > 1:
        a = rows[0::2]
        b = rows[1::2]
        la = lens[0::2]
        lb = lens[1::2]
        new_cap = min(cap * 2, out_bytes + 8)
        pad_a = jnp.concatenate(
            [a, jnp.zeros((a.shape[0], new_cap - cap), U8)], axis=1)
        pad_b = jnp.concatenate(
            [b, jnp.zeros((b.shape[0], new_cap - cap), U8)], axis=1)
        sb = _bitshift_rows(pad_b, la & 7)
        sb = _byteshift_rows(sb, la >> 3, max_shift=new_cap // 2)
        rows = pad_a | sb
        lens = la + lb
        cap = new_cap

    total = lens[0]
    out = rows[0]
    if out.shape[0] < out_bytes:
        out = jnp.concatenate([out, jnp.zeros(out_bytes - out.shape[0], U8)])
    return out[:out_bytes], total
