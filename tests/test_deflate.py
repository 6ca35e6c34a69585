"""Encoder conformance: round-trip via the zlib oracle AND our own inflate,
plus framing, strategies, dictionaries, and bound checks."""
import gzip as gzip_mod
import os
import zlib

import numpy as np
import pytest

from zlibng_tpu.stream.deflate import (
    Z_FILTERED, Z_FIXED, Z_HUFFMAN_ONLY, Z_RLE, compress, compress_bound,
)
from zlibng_tpu.stream.inflate import decompress

rng = np.random.default_rng(7)


def corpus():
    cases = {
        "empty": b"",
        "one": b"a",
        "tiny": b"abcabcabc",
        "runs": b"x" * 10_000 + b"y" * 5_000,
        "text": (b"It is a truth universally acknowledged, that a single man "
                 b"in possession of a good fortune must be in want of a wife. " * 500),
        "binary": bytes(rng.integers(0, 256, 40_000, dtype=np.uint8)),
        "lowentropy": bytes(rng.integers(0, 4, 50_000, dtype=np.uint8)),
        "block_boundary": bytes(rng.integers(0, 8, 65536 * 2 + 17, dtype=np.uint8)),
    }
    ref = "/root/reference/doc/rfc1951.txt"
    if os.path.exists(ref):
        cases["rfc"] = open(ref, "rb").read()
    return cases


CORPUS = corpus()


@pytest.mark.parametrize("name", CORPUS)
@pytest.mark.parametrize("level", [0, 1, 4, 6, 9])
def test_roundtrip_zlib_format(name, level):
    data = CORPUS[name]
    c = compress(data, level=level)
    assert zlib.decompress(c) == data          # golden oracle
    assert decompress(c) == data               # self-consistency


@pytest.mark.parametrize("name", ["tiny", "text", "binary"])
def test_roundtrip_gzip_format(name):
    data = CORPUS[name]
    c = compress(data, level=6, wbits=31)
    assert gzip_mod.decompress(c) == data
    assert decompress(c, wbits=31) == data


@pytest.mark.parametrize("name", ["tiny", "text", "binary"])
def test_roundtrip_raw_format(name):
    data = CORPUS[name]
    c = compress(data, level=6, wbits=-15)
    assert zlib.decompress(c, -15) == data
    assert decompress(c, wbits=-15) == data


@pytest.mark.parametrize("strategy", [Z_FILTERED, Z_HUFFMAN_ONLY, Z_RLE, Z_FIXED])
def test_strategies_roundtrip(strategy):
    for name in ("runs", "text", "lowentropy"):
        data = CORPUS[name]
        c = compress(data, level=6, strategy=strategy)
        assert zlib.decompress(c) == data, (name, strategy)


def test_strategy_effects():
    data = CORPUS["runs"]
    c_huff = compress(data, 6, strategy=Z_HUFFMAN_ONLY)
    c_rle = compress(data, 6, strategy=Z_RLE)
    c_def = compress(data, 6)
    assert len(c_def) <= len(c_rle) <= len(c_huff)


def test_size_competitive_with_zlib():
    """Within 5% of zlib level 6 on text (ratio parity target: ≤)."""
    data = CORPUS["text"]
    ours = len(compress(data, 6))
    theirs = len(zlib.compress(data, 6))
    assert ours <= theirs * 1.05, (ours, theirs)


def test_level_ordering():
    data = CORPUS["text"]
    sizes = [len(compress(data, lv)) for lv in (1, 6, 9)]
    assert sizes[2] <= sizes[0]  # L9 no worse than L1


def test_preset_dictionary_roundtrip():
    dictionary = b"the quick brown fox jumps over the lazy dog"
    data = b"a quick brown fox leaps over the lazy dog repeatedly " * 20
    c = compress(data, 6, dictionary=dictionary)
    d = zlib.decompressobj(zdict=dictionary)
    assert d.decompress(c) == data
    assert decompress(c, dictionary=dictionary) == data
    # dictionary should actually help
    assert len(c) <= len(compress(data, 6))


def test_dictionary_raw_mode():
    dictionary = b"0123456789abcdef" * 64
    data = dictionary[::-1] + dictionary * 3
    c = compress(data, 6, wbits=-15, dictionary=dictionary)
    d = zlib.decompressobj(-15, zdict=dictionary)
    assert d.decompress(c) == data


def test_compress_bound():
    for name, data in CORPUS.items():
        for level in (0, 1, 6, 9):
            c = compress(data, level=level)
            assert len(c) <= compress_bound(len(data)), (name, level)


def test_invalid_wbits():
    from zlibng_tpu.errors import StreamError
    with pytest.raises(StreamError):
        compress(b"x", wbits=99)
