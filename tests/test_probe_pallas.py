"""Fused Pallas probe kernel vs the XLA dense sweep (round-3 verdict
item 3). The kernel must be bit-identical to lz77_jax._probe_best_xla for
every (dense, gate, good) configuration the levels use — winner selection
drives token choice, so any divergence changes compressed output.

Runs the kernel in interpreter mode (CPU backend); the real-TPU dispatch
path is exercised by bench.py on hardware.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zlibng_tpu.ops.lz77_jax import (
    PROBE_WORDS, _build_w4, _probe_best_xla, HASH_MULT,
)
from zlibng_tpu.ops.probe_pallas import probe_best_pallas


def _mk_inputs(data: np.ndarray, hist_valid_from: int):
    """Replicate lz77_lane's probe-input construction for one lane."""
    N = data.shape[0]
    n_ext = 258
    CX = (n_ext + 3) // 4 + 1
    pad = jnp.concatenate([jnp.asarray(data),
                           jnp.zeros(4 * CX + 12, jnp.uint8)])
    w4 = _build_w4(pad)
    h = ((w4[:N] * jnp.uint32(HASH_MULT)) >> jnp.uint32(16)).astype(jnp.int32)
    order = jnp.argsort(h, stable=True).astype(jnp.int32)
    h_sorted = h[order]
    W = PROBE_WORDS
    w2 = jnp.stack([w4[4 * i: N + 4 * i] for i in range(W)], axis=1)
    return w2[order], h_sorted, order


CASES = [
    (2, 16, 8),     # L1
    (16, 16, 12),   # L6
    (32, 16, 12),   # L7 (gated tail)
    (64, 16, 12),   # L9 (gated tail)
    (64, 16, 4),    # aggressive good cut
    (64, 16, 16),   # good off (hunt everything)
]


@pytest.mark.parametrize("dense,gate,good", CASES)
@pytest.mark.parametrize("kind", ["text", "random"])
def test_probe_kernel_matches_xla(dense, gate, good, kind):
    N = 4096
    if kind == "text":
        raw = open("/root/reference/test/data/lcet10.txt", "rb").read()[:N]
        data = np.frombuffer(raw, np.uint8)
    else:
        data = np.random.default_rng(dense + good).integers(
            0, 8, N, dtype=np.uint8)   # small alphabet -> dense collisions
    hv = 100
    w2_s, h_sorted, pos_s = _mk_inputs(data, hv)
    s_ref, c_ref = _probe_best_xla(w2_s, h_sorted, pos_s, hv,
                                   dense, gate, good)
    s_pl, c_pl = probe_best_pallas(w2_s, h_sorted, pos_s, hv,
                                   dense, gate, good, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_pl))
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_pl))


def test_probe_kernel_vmaps_over_lanes():
    """Stage 1 vmaps lz77_lane over lanes; the kernel must batch."""
    N = 2048
    rng = np.random.default_rng(0)
    lanes = rng.integers(0, 16, (3, N), dtype=np.uint8)
    ins = [_mk_inputs(lanes[i], 0) for i in range(3)]
    w2 = jnp.stack([x[0] for x in ins])
    hs = jnp.stack([x[1] for x in ins])
    ps = jnp.stack([x[2] for x in ins])
    hv = jnp.zeros(3, jnp.int32)
    f = jax.vmap(lambda a, b, c, d: probe_best_pallas(
        a, b, c, d, 8, 16, 12, interpret=True))
    s_b, c_b = f(w2, hs, ps, hv)
    for i in range(3):
        s1, c1 = _probe_best_xla(w2[i], hs[i], ps[i], hv[i], 8, 16, 12)
        np.testing.assert_array_equal(np.asarray(s_b[i]), np.asarray(s1))
        np.testing.assert_array_equal(np.asarray(c_b[i]), np.asarray(c1))


@pytest.mark.parametrize("kind", ["text", "random"])
def test_probe_kernel_w2_narrow(kind):
    """chain <= 2 (L1/L2) uses 8-byte probe rows (W=2); the kernel's width
    comes from the input shape and must stay bit-identical to XLA."""
    N = 4096
    if kind == "text":
        raw = open("/root/reference/test/data/lcet10.txt", "rb").read()[:N]
        data = np.frombuffer(raw, np.uint8)
    else:
        data = np.random.default_rng(2).integers(0, 8, N, dtype=np.uint8)
    w2_s, h_sorted, pos_s = _mk_inputs(data, 100)
    w2_s = w2_s[:, :2]                     # narrow probe rows
    s_ref, c_ref = _probe_best_xla(w2_s, h_sorted, pos_s, 100, 2, 16, 8)
    s_pl, c_pl = probe_best_pallas(w2_s, h_sorted, pos_s, 100, 2, 16, 8,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_pl))
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_pl))


@pytest.mark.parametrize("md", [512, 4096])
def test_probe_kernel_reduced_window(md):
    """max_dist (reduced windowBits) masks candidates identically."""
    raw = open("/root/reference/test/data/lcet10.txt", "rb").read()[:4096]
    data = np.frombuffer(raw, np.uint8)
    w2_s, h_sorted, pos_s = _mk_inputs(data, 0)
    s_ref, c_ref = _probe_best_xla(w2_s, h_sorted, pos_s, 0, 16, 16, 12,
                                   max_dist=md)
    s_pl, c_pl = probe_best_pallas(w2_s, h_sorted, pos_s, 0, 16, 16, 12,
                                   max_dist=md, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_pl))
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_pl))
