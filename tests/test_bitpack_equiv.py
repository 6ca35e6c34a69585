"""Bit-exact equivalence of the windowed limb-merge bit packer against a
token-by-token reference packer (the trees_emit.h send_bits semantics),
over randomized token mixes including the adversarial shapes: dense
zero-bit runs (unselected positions), 55-bit tokens, and clusters of
1-bit tokens (up to 8 windows sharing one output byte)."""
import jax.numpy as jnp
import numpy as np
import pytest

from zlibng_tpu.ops.bitpack_merge import hierarchical_pack


def ref_pack(lo, hi, nb, out_bytes):
    out = bytearray(out_bytes)
    pos = 0
    for l, h, n in zip(lo, hi, nb):
        v = (int(h) << 32) | int(l)
        v &= (1 << int(n)) - 1
        for k in range(int(n)):
            if (v >> k) & 1:
                out[(pos + k) >> 3] |= 1 << ((pos + k) & 7)
        pos += int(n)
    return bytes(out), pos


@pytest.mark.parametrize("trial", range(24))
def test_pack_matches_reference(trial):
    rng = np.random.default_rng(100 + trial)
    T = int(rng.choice([64, 128, 256, 1024, 4096]))
    nb = rng.integers(0, 16, T).astype(np.int64)
    zero_mask = rng.random(T) < rng.choice([0.3, 0.9, 0.99])
    nb[zero_mask] = 0
    long_mask = rng.random(T) < 0.05
    nb[long_mask] = rng.integers(30, 56, long_mask.sum())
    if trial % 3 == 0:
        # sparse 1-bit tokens: exercises >2 windows per output byte
        nb[:] = 0
        nb[rng.integers(0, T, 40)] = 1
    lo = rng.integers(0, 1 << 32, T, dtype=np.uint64)
    hi = rng.integers(0, 1 << 23, T, dtype=np.uint64)
    out_bytes = int(nb.sum()) // 8 + 64
    ours, total = hierarchical_pack(
        jnp.asarray(lo.astype(np.uint32)), jnp.asarray(hi.astype(np.uint32)),
        jnp.asarray(nb.astype(np.int32)), out_bytes)
    exp, pos = ref_pack(lo & 0xFFFFFFFF, hi, nb, out_bytes)
    assert int(total) == pos
    assert np.asarray(ours).tobytes() == exp
