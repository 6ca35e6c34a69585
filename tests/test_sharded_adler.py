"""Multi-chip adler32 correctness across lane geometries and payload types.

Round-3 verdict weak #1: `_lane_adler` overflowed uint32 with global weights
(w < 65521, chunk sums up to 255*65520*2048 >> 2^32), so compress_multichip
at its DEFAULT lane geometry emitted zlib streams with a corrupt adler32
trailer on high-entropy data — and every multichip test pinned the one safe
geometry (lane_block=8192). These tests pin the fixed chunk-local
decomposition at every geometry x payload class, default geometry included.

Reference: adler32_p.h:11-13 (NMAX exists precisely because s2 overflows).
"""
import zlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from zlibng_tpu.parallel.sharded import _lane_adler, compress_multichip


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (conftest)")
    return Mesh(np.array(devs[:8]), ("d",))


def _payload(kind: str, n: int) -> bytes:
    if kind == "text":
        data = open("/root/reference/test/data/lcet10.txt", "rb").read()
        return (data * (n // len(data) + 1))[:n]
    if kind == "random":
        return np.random.default_rng(0xADA).integers(
            0, 256, n, dtype=np.uint8).tobytes()
    assert kind == "ff"
    return b"\xff" * n


@pytest.mark.parametrize("kind", ["text", "random", "ff"])
def test_lane_adler_matches_zlib(kind):
    """_lane_adler on a full 128 KiB-payload lane (the worst-case weighted
    sum) must equal zlib.adler32 of the payload slice."""
    hist = 32768
    payload = _payload(kind, 131072)
    lane = np.concatenate([
        np.zeros(hist, np.uint8), np.frombuffer(payload, np.uint8)])
    got = int(_lane_adler(jnp.asarray(lane), jnp.int32(hist),
                          jnp.int32(lane.size)))
    assert got == zlib.adler32(payload)


def test_lane_adler_partial_slice():
    """Masked positions (before enc_start / after enc_end) must not leak
    into the checksum, including the trailing-weight correction of the
    chunk containing enc_end."""
    rng = np.random.default_rng(7)
    lane = rng.integers(0, 256, 40960, dtype=np.uint8)
    es, ee = 32768, 32768 + 5000          # enc_end mid-chunk
    got = int(_lane_adler(jnp.asarray(lane), jnp.int32(es), jnp.int32(ee)))
    assert got == zlib.adler32(lane[es:ee].tobytes())


def test_lane_adler_unaligned_lane_length():
    """Lane lengths that are not a multiple of the 2048-byte chunk must be
    padded, not mis-reshaped."""
    lane = np.full(3000, 0xFF, np.uint8)
    got = int(_lane_adler(jnp.asarray(lane), jnp.int32(100), jnp.int32(2900)))
    assert got == zlib.adler32(lane[100:2900].tobytes())


@pytest.mark.parametrize("kind", ["text", "random", "ff"])
@pytest.mark.parametrize("lane_block", [1 << 16, 1 << 17])
def test_multichip_default_geometry_roundtrip(mesh, kind, lane_block):
    """compress_multichip at the DEFAULT (64 KiB) and maximum (128 KiB)
    lane geometries must round-trip through zlib.decompress — the adler
    trailer is verified by zlib itself — on text, pure-random, and all-0xFF
    payloads (random/0xFF maximize the weighted sums)."""
    data = _payload(kind, 3 * lane_block // 2 + 4096)  # 2 lanes, ragged tail
    z = compress_multichip(data, mesh, level=6, lane_block=lane_block)
    assert zlib.decompress(z) == data
    import struct
    assert struct.unpack(">I", z[-4:])[0] == zlib.adler32(data)
