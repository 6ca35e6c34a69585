"""Device bit packing: windowed limb-merge + aligned placement.

The scan+scatter (or per-bit searchsorted) formulations of DEFLATE bit
packing are point-gather-bound on TPU. This kernel instead treats every
token as a short little-endian u32-limb string (2 limbs holding <=55 bits)
and concatenates strings pairwise — but only WITHIN windows of 128 tokens,
so row caps stay <= 256 limbs (1 KiB):

    level 0:  T strings of 2 limbs    (token bits at offset 0 of each cell)
    level s:  T/2^s strings of 2^(s+1) limbs, s <= 7
    concat(a, b): shift b left by (len(a) mod 32) bits (elementwise limb
    carry), limb-shift by len(a)//32 via log2(cap) conditional static
    rolls, OR into a's buffer.

The T/128 window rows are then byte-unpacked once and placed in one
vectorized pass: each row is bit-shifted to its global intra-byte phase,
and every output byte ORs the (at most 8) non-empty windows that can
cover it, found by a log2(W)-round binary search over the window
byte-start table plus chained prev-non-empty hops. All bits are globally
disjoint and OR is idempotent, so over-collecting candidates is exact.

Earlier rounds merged all the way up at byte granularity: the upper
levels' conditional byte-rolls alone were ~75% of the whole encode
pipeline's cost. Limb granularity cuts every level 4x and stopping at
1 KiB caps removes the expensive upper levels entirely.

This is the TPU-native replacement for trees_emit.h's sequential 64-bit
send_bits accumulator.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

U8 = jnp.uint8
U32 = jnp.uint32
I32 = jnp.int32

# tokens merged pairwise per window; limb caps stay <= 2*WINDOW
WINDOW = 128


def _bitshift_limbs(rows: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Shift each row's LSB-first bitstream left by r (0..31) bits.
    rows: (M, L) uint32 little-endian limbs; r: (M,) int32."""
    rr = r.astype(U32)[:, None]
    lo = jnp.where(rr > 0, rows << rr, rows)
    carry_in = jnp.concatenate(
        [jnp.zeros((rows.shape[0], 1), U32), rows[:, :-1]], axis=1)
    hi = jnp.where(rr > 0, carry_in >> (U32(32) - rr), U32(0))
    return lo | hi


def _limbshift_rows(rows: jnp.ndarray, nlimbs: jnp.ndarray,
                    max_shift: int) -> jnp.ndarray:
    """Shift each row right (toward higher indices) by nlimbs
    (0..max_shift) limbs using conditional static rolls — log2 passes."""
    out = rows
    shift = nlimbs.astype(I32)
    k = 1
    while k <= max_shift:
        use = ((shift & k) > 0)[:, None]
        shifted = jnp.concatenate(
            [jnp.zeros((rows.shape[0], k), U32), out[:, :-k]], axis=1)
        out = jnp.where(use, shifted, out)
        k <<= 1
    return out


def _limbs_to_bytes(rows: jnp.ndarray) -> jnp.ndarray:
    """(M, L) u32 little-endian limbs -> (M, 4L) u8 bytes."""
    M, L = rows.shape
    b = jnp.stack([(rows >> U32(8 * k)) & U32(0xFF) for k in range(4)],
                  axis=2)
    return b.reshape(M, 4 * L).astype(U8)


def _bitshift_bytes(rows: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Shift each row's LSB-first byte stream left by r (0..7) bits."""
    rw = rows.astype(U32)
    rr = r.astype(U32)[:, None]
    lo = (rw << rr) & 0xFF
    carry_in = jnp.concatenate(
        [jnp.zeros((rows.shape[0], 1), U32), rw[:, :-1]], axis=1)
    hi = jnp.where(rr > 0, carry_in >> (8 - rr), 0)
    return (lo | hi).astype(U8)


def hierarchical_pack(lo: jnp.ndarray, hi: jnp.ndarray, nbits: jnp.ndarray,
                      out_bytes: int, max_cover: int = 8):
    """Pack (lo, hi, nbits) token arrays (T must be a power of two; pad with
    zero-bit tokens) into one LSB-first byte stream.

    max_cover bounds how many non-empty windows can overlap one output
    byte: every non-empty window carries >= minlen bits (the smallest
    code length of the tables in play), so 1 + ceil(7/minlen) suffices —
    the caller can shrink the placement's gather rounds from the
    degenerate-worst 8 to the typical 3 when it knows the tables.

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

    rows = jnp.stack([lo.astype(U32), hi.astype(U32)], axis=1)  # (T, 2)
    lens = nbits.astype(I32)
    cap = 2                                    # limbs per row
    while rows.shape[0] > max(1, T // WINDOW):
        a = rows[0::2]
        b = rows[1::2]
        la = lens[0::2]
        lb = lens[1::2]
        new_cap = cap * 2
        pad_a = jnp.concatenate(
            [a, jnp.zeros((a.shape[0], new_cap - cap), U32)], axis=1)
        pad_b = jnp.concatenate(
            [b, jnp.zeros((b.shape[0], new_cap - cap), U32)], axis=1)
        sb = _bitshift_limbs(pad_b, la & 31)
        sb = _limbshift_rows(sb, la >> 5, max_shift=new_cap // 2)
        rows = pad_a | sb
        lens = la + lb
        cap = new_cap

    byte_rows = _limbs_to_bytes(rows)
    if rows.shape[0] == 1:
        total = lens[0]
        out = byte_rows[0]
        if out.shape[0] < out_bytes:
            out = jnp.concatenate(
                [out, jnp.zeros(out_bytes - out.shape[0], U8)])
        return out[:out_bytes], total

    return _place_windows(byte_rows, lens, out_bytes, max_cover)


def _place_windows(rows: jnp.ndarray, lens: jnp.ndarray, out_bytes: int,
                   max_cover: int = 8):
    """Assemble W window byte-rows (bit lengths `lens`) into one stream.

    Each row is bit-shifted to its global intra-byte phase, then OR-merged
    into the output by a W-step scan of dynamic-slice windows: step w ORs
    row w into acc[byte_start(w) : +cap]. Consecutive windows overlap only
    in their boundary byte, where the two streams occupy disjoint bits, so
    OR is exact. This replaced a per-output-byte binary search + max_cover
    point gathers (the `contrib` chain): window-contiguous slice updates
    are wide vector ops, point gathers are the classic TPU decimator —
    measured 2.4x on the whole pack at 128 units x 16K tokens (the
    max_cover parameter is retained for call compatibility; the scan needs
    no cover bound).

    Returns (bytes (out_bytes,) uint8, total_bits ())."""
    del max_cover
    W, cap = rows.shape
    starts = jnp.concatenate([jnp.zeros(1, I32),
                              jnp.cumsum(lens)[:-1].astype(I32)])
    total = starts[-1] + lens[-1]
    # phase-align: row w's stream begins at bit (starts[w] & 7) of its
    # local byte 0 (one spill byte for the shift)
    rows = jnp.concatenate([rows, jnp.zeros((W, 1), U8)], axis=1)
    rows = _bitshift_bytes(rows, starts & 7)
    cap += 1
    bs = starts >> 3                                      # (W,) byte starts

    acc = jnp.zeros(out_bytes + cap, U8)

    def body(w, acc):
        cur = jax.lax.dynamic_slice(acc, (bs[w],), (cap,))
        return jax.lax.dynamic_update_slice(acc, cur | rows[w], (bs[w],))

    acc = jax.lax.fori_loop(0, W, body, acc)
    return acc[:out_bytes], total
