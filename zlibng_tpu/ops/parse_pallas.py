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


def parse_select_encode(step: jnp.ndarray, bounds: jnp.ndarray) -> jnp.ndarray:
    """Encode-path parse: identical selection to parse_select(step, bounds),
    with literal RUNS collapsed into single kernel iterations.

    At a literal position the walk's next interesting stop is the next
    match candidate, so the kernel walks a fused step array
    (match: step[pos]; literal: next_match - pos) — one dependent load per
    selected match or literal-run start instead of one per token. The
    skipped positions are exactly the literals between stops, recovered
    vectorized: a position is selected iff it is in range and not covered
    by a selected match's body (cummax cover mask). On all-literal data
    (jpg-class lanes) the serial walk collapses to ~one iteration per
    lane — measured 250 ms of a 480 ms stage-1 dispatch before.

    Unlike the retired jump-table variant (see STATUS dead-ends), the
    fused array needs NO gather to build: one reversed cummin + a where."""
    if jax.default_backend() != "tpu":
        return parse_select(step, bounds)
    B, N = step.shape
    pos = jnp.arange(N, dtype=I32)[None, :]
    is_m = step > 1
    nm = jax.lax.cummin(jnp.where(is_m, pos, N)[:, ::-1], axis=1)[:, ::-1]
    fused = jnp.where(is_m, step, nm - pos)
    visited = parse_select_pallas(fused, bounds)
    msel = visited & is_m
    e = jnp.where(msel, pos + step, 0)
    run = jax.lax.cummax(e, axis=1)
    covered = pos < jnp.concatenate(
        [jnp.zeros((B, 1), I32), run[:, :-1]], axis=1)
    return (pos >= bounds[:, 0:1]) & (pos < bounds[:, 1:2]) & ~covered
