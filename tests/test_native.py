"""Compiled host runtime (native/zng_host.c) vs the Python reference paths.

Mirrors the reference's kernel-dispatch test strategy (SURVEY §4.2: every
SIMD variant is run against golden vectors next to the generic C): each
native kernel is compared against the pure-Python/numpy implementation
and the zlib oracle on the same inputs, including the streaming
NEED_INPUT edges and corrupt-stream error codes.
"""
import random
import zlib

import numpy as np
import pytest

import zlibng_tpu.stream.inflate_serial as ser
from zlibng_tpu import native
from zlibng_tpu.huffman.decode_tables import (
    DISTS, LENS, build_decode_lut, build_packed_lut,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C toolchain")


@pytest.fixture
def force_python(monkeypatch):
    """Route the serial decoder through the pure-Python hot loop."""
    monkeypatch.setattr(ser, "_native_lib", False)


def test_checksums_vs_zlib():
    rng = np.random.default_rng(3)
    for n in (0, 1, 7, 64, 5551, 5552, 5553, 1 << 18):
        b = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        for seed in (1, 0, 0xDEADBEEF, 0xFFFFFFFF):
            assert native.adler32(b, seed) == zlib.adler32(b, seed & 0xFFFFFFFF)
            assert native.crc32(b, seed) == zlib.crc32(b, seed & 0xFFFFFFFF)


def test_checksum_module_routes_native():
    from zlibng_tpu.checksum.adler32 import adler32
    from zlibng_tpu.checksum.crc32 import crc32
    b = b"framework checksum routing" * 1000
    assert adler32(b) == zlib.adler32(b)
    assert crc32(b) == zlib.crc32(b)


def test_fill_lut_matches_python_builder():
    rng = random.Random(5)
    # random valid canonical length sets, built by trimming a Huffman pass
    for trial in range(20):
        freqs = np.array([rng.randrange(0, 50) for _ in range(286)], np.int64)
        freqs[256] = max(freqs[256], 1)
        from zlibng_tpu.huffman.encode import huffman_table
        lens, _ = huffman_table(freqs, 15)
        packed = build_packed_lut(lens, LENS, max_len=15)
        sym, bits = build_decode_lut(lens, LENS, max_len=15)
        ref = ((sym.astype(np.int64) << 4) | bits).astype(np.int32)
        assert np.array_equal(packed, ref)
    # degenerate: single 1-bit distance code (incomplete-but-allowed)
    lens = np.zeros(30, np.int32)
    lens[4] = 1
    assert np.array_equal(
        build_packed_lut(lens, DISTS, max_len=15),
        (((lambda sb: (sb[0].astype(np.int64) << 4) | sb[1])(
            build_decode_lut(lens, DISTS, max_len=15)))).astype(np.int32))


def _decode_both_ways(payload, monkeypatch, dribble=False):
    results = []
    for force in (False, True):
        monkeypatch.setattr(ser, "_native_lib", False if force else None)
        inf = ser.RawInflater()
        try:
            if dribble:
                r = None
                for i in range(len(payload)):
                    inf.feed(payload[i:i + 1])
                    r = inf.run(finish=(i == len(payload) - 1))
            else:
                inf.feed(payload)
                r = inf.run(finish=True)
            results.append(("ok", bytes(inf.out), inf.bitpos,
                            inf.codes_used, r))
        except ser.InflateError as e:
            results.append(("err", str(e)))
    monkeypatch.setattr(ser, "_native_lib", None)
    return results


def test_decode_loop_parity(monkeypatch):
    data = open("/root/reference/test/data/lcet10.txt", "rb").read()[:150_000]
    for level in (1, 6, 9):
        payload = zlib.compress(data, level)[2:-4]
        a, b = _decode_both_ways(payload, monkeypatch)
        assert a == b and a[0] == "ok"


def test_decode_loop_parity_dribble(monkeypatch):
    data = (b"the quick brown fox " * 500) + bytes(3000)
    payload = zlib.compress(data, 6)[2:-4]
    a, b = _decode_both_ways(payload, monkeypatch, dribble=True)
    assert a == b and a[0] == "ok"


def test_decode_loop_parity_corrupt(monkeypatch):
    data = open("/root/reference/test/data/lcet10.txt", "rb").read()[:80_000]
    payload = bytearray(zlib.compress(data, 6)[2:-4])
    rng = random.Random(11)
    for _ in range(25):
        bb = bytearray(payload)
        bb[rng.randrange(len(bb))] ^= 1 << rng.randrange(8)
        a, b = _decode_both_ways(bytes(bb), monkeypatch)
        assert a == b


def test_python_fallback_suite_still_works(force_python):
    # the full serial decoder remains correct without the native library
    data = b"fallback path stays the specification" * 2000
    payload = zlib.compress(data, 6)[2:-4]
    out, _ = ser.inflate_raw(payload)
    assert out == data
