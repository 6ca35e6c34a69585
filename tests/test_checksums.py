"""Checksum parity vs the Python zlib oracle (bit-compatible with zlib-ng)."""
import os
import zlib

import numpy as np
import pytest

from zlibng_tpu.checksum.adler32 import adler32, adler32_combine, adler32_partials
from zlibng_tpu.checksum.crc32 import (
    crc32, crc32_combine, crc32_combine_gen, crc32_combine_op,
)

rng = np.random.default_rng(42)

CASES = [
    b"",
    b"a",
    b"hello world",
    bytes(rng.integers(0, 256, 7, dtype=np.uint8)),
    bytes(rng.integers(0, 256, 5552, dtype=np.uint8)),
    bytes(rng.integers(0, 256, 5553, dtype=np.uint8)),
    bytes(rng.integers(0, 256, 100_000, dtype=np.uint8)),
    bytes(1_000_000),  # all zeros
    b"\xff" * 123_457,
]


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_adler32_matches_zlib(data):
    assert adler32(data) == zlib.adler32(data)


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_adler32_seeded(data):
    assert adler32(data, 0xDEADBEEF % (1 << 32)) == zlib.adler32(data, 0xDEADBEEF % (1 << 32))


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_crc32_matches_zlib(data):
    assert crc32(data) == zlib.crc32(data)


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_crc32_seeded(data):
    assert crc32(data, 12345678) == zlib.crc32(data, 12345678)


@pytest.mark.parametrize("split", [0, 1, 100, 5552, 99_999])
def test_adler32_combine(split):
    data = bytes(rng.integers(0, 256, 100_000, dtype=np.uint8))
    a, b = data[:split], data[split:]
    combined = adler32_combine(zlib.adler32(a), zlib.adler32(b), len(b))
    assert combined == zlib.adler32(data)


@pytest.mark.parametrize("split", [0, 1, 100, 5552, 99_999])
def test_crc32_combine(split):
    data = bytes(rng.integers(0, 256, 100_000, dtype=np.uint8))
    a, b = data[:split], data[split:]
    combined = crc32_combine(zlib.crc32(a), zlib.crc32(b), len(data) - split)
    assert combined == zlib.crc32(data)


def test_crc32_combine_gen_op():
    data = bytes(rng.integers(0, 256, 4096, dtype=np.uint8))
    op = crc32_combine_gen(2048)
    got = crc32_combine_op(zlib.crc32(data[:2048]), zlib.crc32(data[2048:]), op)
    assert got == zlib.crc32(data)


def test_adler32_partials_tree_merge():
    """Sharded adler: per-chunk partials merged with combine — exact."""
    data = rng.integers(0, 256, 8 * 4096, dtype=np.uint8)
    partials, chunk_len = adler32_partials(data.reshape(8, 4096))
    acc = int(partials[0])
    for p in partials[1:]:
        acc = adler32_combine(acc, int(p), chunk_len)
    assert acc == zlib.adler32(data.tobytes())
