"""Reduced-window (windowBits < 15) compliance.

The declared windowBits bounds the match distance the encoder may emit
(reference MAX_DIST, deflate.h:415; validation deflate.c:306-316; tested by
test/test_small_window.cc). A conforming decoder allocates exactly the
declared window, so a farther-back match is rejected with "invalid distance
too far back" — round-4 verdict repro: compress(wbits=9) failed
zlib.decompressobj(9).
"""
import zlib

import numpy as np
import pytest

import zlibng_tpu
from zlibng_tpu.format.constants import effective_window
from zlibng_tpu.stream.api import Deflate, Z_FINISH
from zlibng_tpu.stream.deflate import compress as compress_host


def _corpus(n: int, seed: int = 7) -> bytes:
    """Text-like data with matches at many distances (including far back):
    a small vocabulary repeated with drifting phase, so every window size
    sees both in-window and out-of-window repeats."""
    rng = np.random.default_rng(seed)
    words = [bytes(rng.integers(97, 123, rng.integers(3, 12), dtype=np.uint8))
             for _ in range(80)]
    out = bytearray()
    i = 0
    while len(out) < n:
        out += words[(i * 17) % 80] + b" "
        i += 1
    return bytes(out[:n])


def _far_corpus(n: int, period: int = 3000, seed: int = 3) -> bytes:
    """Random `period`-byte segment repeated: every repeat is a match at
    exactly `period` distance — illegal for windows smaller than that."""
    rng = np.random.default_rng(seed)
    seg = bytes(rng.integers(0, 256, period, dtype=np.uint8))
    reps = -(-n // period)
    return (seg * reps)[:n]


WBITS = list(range(9, 16))


@pytest.mark.parametrize("w", WBITS)
def test_host_zlib_small_window(w):
    data = _corpus(4 * (1 << w) + 777)
    out = compress_host(data, level=6, wbits=w)
    d = zlib.decompressobj(w)
    assert d.decompress(out) + d.flush() == data


@pytest.mark.parametrize("w", WBITS)
def test_host_raw_small_window(w):
    data = _far_corpus(4 * (1 << w))
    out = compress_host(data, level=6, wbits=-w)
    d = zlib.decompressobj(-w)
    assert d.decompress(out) + d.flush() == data


@pytest.mark.parametrize("w", [9, 12])
def test_host_gzip_small_window(w):
    data = _corpus(4 * (1 << w))
    out = compress_host(data, level=6, wbits=w + 16)
    d = zlib.decompressobj(w + 16)
    assert d.decompress(out) + d.flush() == data


@pytest.mark.parametrize("w", [9, 11, 13])
@pytest.mark.parametrize("level", [1, 6, 9])
def test_tpu_small_window(w, level):
    data = _corpus(4 * (1 << w) + 100)
    out = zlibng_tpu.compress_tpu(data, level=level, wbits=w)
    d = zlib.decompressobj(w)
    assert d.decompress(out) + d.flush() == data


@pytest.mark.parametrize("w", [9, 12])
def test_tpu_far_matches_masked(w):
    # repeats at distance 3000: must NOT be emitted for w=9/w=12 … 3000 fits
    # in 4096 so w=12 keeps them; w=9 must drop them. Both must decode.
    data = _far_corpus(200_000)
    out = zlibng_tpu.compress_tpu(data, level=6, wbits=w)
    d = zlib.decompressobj(w)
    assert d.decompress(out) + d.flush() == data


@pytest.mark.parametrize("w", [9, 12, 15])
def test_stream_small_window(w):
    data = _corpus(5 * (1 << w))
    df = Deflate(level=6, wbits=w)
    out = df.compress(data[: len(data) // 2])
    out += df.compress(data[len(data) // 2:], Z_FINISH)
    d = zlib.decompressobj(w)
    assert d.decompress(out) + d.flush() == data


def test_stream_dictionary_small_window():
    w = 9
    dictionary = _corpus(4096, seed=11)
    data = _corpus(3 * (1 << w), seed=12)
    df = Deflate(level=6, wbits=w, dictionary=dictionary)
    out = df.compress(data, Z_FINISH)
    d = zlib.decompressobj(w, zdict=dictionary)
    assert d.decompress(out) + d.flush() == data


def test_wbits8_redeclared_as_9():
    # deflate.c:306-316: windowBits 8 is re-declared as 9 — header says 9
    # AND matches respect the 512-byte window, so decompressobj(9) accepts.
    data = _far_corpus(60_000, period=700)  # dist-700 repeats: >512, <=512? no
    out = compress_host(data, level=6, wbits=8)
    assert (out[0] >> 4) == 9 - 8  # CMF window field declares 512
    d = zlib.decompressobj(9)
    assert d.decompress(out) + d.flush() == data


def test_effective_window_table():
    assert effective_window(15) == 1 << 15
    assert effective_window(9) == 512
    assert effective_window(8) == 512   # re-declared as 9
    assert effective_window(-8) == 512
    assert effective_window(-12) == 1 << 12
    assert effective_window(25) == 512  # gzip 16+9
    assert effective_window(31) == 1 << 15
