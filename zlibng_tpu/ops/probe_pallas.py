"""Pallas TPU kernel: fused dense probe sweep for the LZ77 match engine.

The dense probe loop compares every sorted position against its k-th
same-hash predecessor for k = 1..chain (the TPU re-expression of the
match_tpl.h:130-174 chain walk — candidates are ADJACENT rows in
(hash, pos) sorted order, so each probe is an array shift, not a gather).
The XLA formulation materializes (N, W) intermediates in HBM every pass;
at chain 16 that is the dominant stage-1 cost (round-3 verdict item 3).

This kernel keeps a tile of the sorted probe rows in VMEM and runs all
`dense` shifted compares + winner selects in-register: HBM traffic drops
from ~dense reads of the probe planes to exactly one read + one (2, N)
write.

Layout: the lane's N sorted positions become a (N/128, 128) grid per
plane (4 probe words, hash, position). A flat shift by k (k < 128) is two
static lane-slices with a one-row sublane carry:

    shifted[r, c] = flat[r*128 + c - k]
                  = concat(plane[r-1, 128-k:], plane[r, :128-k])

so each tile needs a 1-row halo, delivered as a second blocked input
(tile i's halo row = flat row i*R - 1; blocked specs keep the kernel
jax.vmap-batchable over lanes, unlike manual DMA with dynamic slices).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U32 = jnp.uint32

_W = 4                    # probe words (lz77_jax.PROBE_WORDS)
_NEG = -(1 << 30)
_WINDOW = 1 << 15


def _ctz_bytes32_i(x: jnp.ndarray) -> jnp.ndarray:
    """Leading equal bytes from an i32-bitcast xor word (0..4)."""
    xu = x.astype(U32)
    lsb = xu & (~xu + U32(1))
    ctz = jax.lax.population_count(lsb - U32(1))
    return jnp.where(xu == 0, 4, (ctz >> U32(3)).astype(I32))


def _probe_kernel(dense: int, gate_depth: int, good_l16: int, max_dist: int,
                  R: int, W: int,
                  params_ref, body_ref, halo_ref, score_ref, cand_ref):
    hv = params_ref[0, 0]
    # halo block is (1, W+2, 128) — Mosaic requires the last two block dims
    # (8,128)-divisible or full-size, so the tile axis leads
    full = jnp.concatenate([halo_ref[0][:, None, :], body_ref[:]],
                           axis=1)                              # (W+2,R+1,128)
    q = [full[w, 1:, :] for w in range(W)]
    qh = full[W, 1:, :]
    qpos = full[W + 1, 1:, :]
    neg = jnp.int32(_NEG)
    bs = jnp.full((R, 128), neg, I32)
    bc = jnp.zeros((R, 128), I32)
    lane = jax.lax.broadcasted_iota(I32, (R, 128), 1)
    hunting = None
    for k in range(1, dense + 1):
        if k == gate_depth + 1:
            # deflateTune `good` gate (match_tpl.h:84-88): settled rows
            # stop improving past gate_depth probes
            cur = jnp.where(bs > neg, (bs + (qpos - bc)) >> 20, 0)
            hunting = cur < good_l16

        def sh(p):
            # flat shift by k: one lane-rotate of the haloed plane, then
            # pick the carried row for the k wrapped lanes (Mosaic cannot
            # lower narrow lane-concats; roll is a native rotate)
            r = pltpu.roll(p, k, 1)
            return jnp.where(lane < k, r[:-1, :], r[1:, :])

        x = q[W - 1] ^ sh(full[W - 1])
        l16 = _ctz_bytes32_i(x)
        for w in range(W - 2, -1, -1):
            x = q[w] ^ sh(full[w])
            l16 = jnp.where(x != 0, _ctz_bytes32_i(x), 4 + l16)
        ch = sh(full[W])
        cpos = sh(full[W + 1])
        dist = qpos - cpos
        ok = (qh == ch) & (cpos >= hv) & (dist <= max_dist) & (dist > 0)
        score = jnp.where(ok, (l16 << 20) - dist, neg)
        better = score > bs
        if hunting is not None:
            better = better & hunting
        bs = jnp.where(better, score, bs)
        bc = jnp.where(better, cpos, bc)
    score_ref[:] = bs
    cand_ref[:] = bc


def _pick_tile_rows(nr: int) -> int:
    """Tile row count: 8-divisible (Mosaic sublane constraint) or the full
    array (single tile)."""
    for r in (64, 32, 16, 8):
        if nr % r == 0:
            return r
    return nr


@functools.partial(jax.jit, static_argnames=("dense", "gate_depth",
                                             "good_l16", "max_dist",
                                             "interpret"))
def probe_best_pallas(w2_s: jnp.ndarray, h_sorted: jnp.ndarray,
                      pos_s: jnp.ndarray, hist_valid_from,
                      dense: int, gate_depth: int, good_l16: int,
                      max_dist: int = _WINDOW,
                      interpret: bool = False):
    """Fused dense probe sweep. w2_s: (N, W) uint32 sorted probe rows
    (W = 2 or 4 probe words, static from the input shape); h_sorted/pos_s:
    (N,) int32. Returns (best_score, best_cand) (N,) i32, identical to the
    XLA dense loop in lz77_jax._probe_best_xla."""
    N = h_sorted.shape[0]
    W = w2_s.shape[1]
    P = W + 2
    assert N % 128 == 0, N
    NR = N // 128
    R = _pick_tile_rows(NR)
    grid = NR // R

    planes = jnp.stack(
        [w2_s[:, w].astype(I32).reshape(NR, 128) for w in range(W)]
        + [h_sorted.reshape(NR, 128), pos_s.reshape(NR, 128)],
        axis=0)                                         # (P, NR, 128)
    # halo row for tile i = flat row i*R - 1, tile axis LEADING so the
    # trailing block dims stay full-size (6, 128) for Mosaic; tile 0 pads
    # (h = -1 so the same-hash test can never match before the first row)
    pad = jnp.zeros((1, P, 128), I32).at[:, W].set(-1)
    if grid > 1:
        halo = jnp.concatenate(
            [pad, jnp.swapaxes(planes[:, R - 1::R, :][:, :grid - 1, :],
                               0, 1)], axis=0)          # (grid, 6, 128)
    else:
        halo = pad
    params = jnp.reshape(jnp.asarray(hist_valid_from, I32), (1, 1))

    kern = functools.partial(_probe_kernel, dense, gate_depth, good_l16,
                             max_dist, R, W)
    score, cand = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((P, R, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((NR, 128), I32),
                   jax.ShapeDtypeStruct((NR, 128), I32)],
        interpret=interpret,
    )(params, planes, halo)
    return score.reshape(N), cand.reshape(N)
