"""Device checksum kernels vs the zlib oracle (virtual CPU backend)."""
import zlib

import numpy as np
import pytest

from zlibng_tpu.ops.checksum_jax import adler32_jax, crc32_jax

rng = np.random.default_rng(11)

# sizes quantize to chunk multiples on device; keep the set small — every
# distinct padded shape is a fresh XLA compile on the CPU test backend
SIZES = [0, 1, 1023, 1025, 66_000]


@pytest.mark.parametrize("n", SIZES)
def test_adler32_device(n):
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    assert adler32_jax(data) == zlib.adler32(data)


@pytest.mark.parametrize("n", SIZES)
def test_crc32_device(n):
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    assert crc32_jax(data) == zlib.crc32(data)


def test_seeded():
    data = rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes()
    assert adler32_jax(data, 123456) == zlib.adler32(data, 123456)
    assert crc32_jax(data, 654321) == zlib.crc32(data, 654321)


def test_ndarray_input():
    arr = rng.integers(0, 256, 10_000, dtype=np.uint8)
    assert crc32_jax(arr) == zlib.crc32(arr.tobytes())
    assert adler32_jax(arr) == zlib.adler32(arr.tobytes())
