"""Pallas TPU kernel: greedy/lazy parse chain walk.

The parse — follow pos += step[pos] from enc_start to enc_end marking
selected token positions — is the one truly serial stage of the encoder.
The XLA formulation (pointer-doubling reachability) needs ~54 point
gathers ≈ 34 ms/lane on v5e; this kernel walks the chain sequentially in
VMEM instead: one dependent scalar load per emitted token, ~0.3 ms for a
typical 64 KiB lane. Grid iterates over lanes.

This is the deflate_fast/deflate_slow emission loop (reference
deflate_fast.c:19-104) reduced to its essential serial core, with all
match decisions precomputed by the vectorized stages.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def _parse_kernel(bounds_ref, step_ref, sel_ref):
    # Mosaic only allows 128-aligned dynamic vector loads/stores, so the
    # walk works in 128-lane blocks: step rows load as aligned vectors
    # (element picked by iota-select), selections accumulate in a 128-wide
    # one-hot register flushed on block exit.
    b = pl.program_id(0)
    es = bounds_ref[b, 0]
    ee = bounds_ref[b, 1]
    sel_ref[...] = jnp.zeros_like(sel_ref)
    lanes = jax.lax.broadcasted_iota(I32, (128,), 0)

    def body(state):
        i, blk, acc = state
        nb = i >> 7

        @pl.when(nb != blk)
        def _():
            sel_ref[0, 0, pl.ds(pl.multiple_of(blk * 128, 128), 128)] = acc

        acc = jnp.where(nb != blk, jnp.zeros_like(acc), acc)
        off = i & 127
        acc = acc | (lanes == off).astype(I32)
        row = step_ref[0, 0, pl.ds(pl.multiple_of(nb * 128, 128), 128)]
        s = jnp.sum(jnp.where(lanes == off, row, 0))
        return i + jnp.maximum(s, 1), nb, acc

    i, blk, acc = jax.lax.while_loop(
        lambda st: st[0] < ee, body, (es, es >> 7, jnp.zeros(128, I32)))

    @pl.when(es < ee)
    def _():
        sel_ref[0, 0, pl.ds(pl.multiple_of(blk * 128, 128), 128)] = acc


@functools.partial(jax.jit, static_argnames=())
def parse_select_pallas(step: jnp.ndarray, bounds: jnp.ndarray) -> jnp.ndarray:
    """step: (B, N) int32 jump sizes; bounds: (B, 2) int32 [enc_start, enc_end).
    Returns (B, N) bool selection mask."""
    B, N = step.shape
    out = pl.pallas_call(
        _parse_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B, 2), lambda b: (0, 0), memory_space=pltpu.SMEM),
            # (B,1,N) with (1,1,N) blocks keeps the trailing dims tileable
            pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, N), I32),
    )(bounds, step.reshape(B, 1, N))
    return out.reshape(B, N) > 0


def parse_select(step: jnp.ndarray, bounds: jnp.ndarray) -> jnp.ndarray:
    """Backend dispatch: pallas kernel on TPU, pointer-doubling elsewhere
    (the CPU interpreter would execute the serial walk in Python)."""
    if jax.default_backend() == "tpu":
        return parse_select_pallas(step, bounds)
    from .lz77_jax import _reachable_jax

    def one(s, b):
        return _reachable_jax(jnp.minimum(jnp.arange(s.shape[0], dtype=I32)
                                          + jnp.maximum(s, 1), b[1]),
                              b[0], b[1])
    return jax.vmap(one)(step, bounds)
