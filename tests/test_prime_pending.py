"""Sub-byte deflatePrime/inflatePrime/deflatePending edge semantics.

The reference's bit-stitching surface (deflate.c:600-633 deflatePrime,
inflate.c:277-302 inflatePrime, deflate.c:589-598 deflatePending): prime
injects k raw bits below/ahead of the coded stream, so a k-bit-shifted
stream must round-trip for every k, including fractional bytes and input
arriving after the prime.
"""
import zlib

import pytest

from zlibng_tpu.stream.api import Deflate, Inflate, Z_FINISH

DATA = (b"prime edge payload " * 300) + bytes(range(256)) * 4


def _strip_bits(blob: bytes, k: int) -> tuple[int, bytes]:
    """Return (first k bits LSB-first, remaining stream shifted right k)."""
    big = int.from_bytes(blob, "little")
    first = big & ((1 << k) - 1)
    rest = big >> k
    nbits = len(blob) * 8 - k
    return first, rest.to_bytes((nbits + 7) // 8, "little")


@pytest.mark.parametrize("k", [1, 3, 5, 7, 8, 11, 16])
def test_deflate_prime_bit_exact(k):
    """deflatePrime(k, v) puts exactly k LSB-first bits ahead of the raw
    stream: stripping them must yield a stream zlib can decode."""
    v = (0b1011001110110011 & ((1 << k) - 1))
    d = Deflate(level=6, wbits=-15)
    d.prime(k, v)
    out = d.compress(DATA, Z_FINISH)
    first, rest = _strip_bits(out, k)
    assert first == v
    assert zlib.decompress(rest, -15) == DATA


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 6, 7, 9, 13, 16])
def test_inflate_prime_roundtrip(k):
    """Strip k bits off a raw stream, hand them back via inflatePrime, feed
    the shifted remainder: output must be bit-exact (gzlog usage)."""
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    c = comp.compress(DATA) + comp.flush()
    first, rest = _strip_bits(c, k)
    inf = Inflate(wbits=-15)
    inf.prime(k, first)
    out = inf.decompress(rest, finish=True)
    assert out == DATA


@pytest.mark.parametrize("k", [3, 8, 11])
def test_inflate_prime_then_streaming_chunks(k):
    """Input appended AFTER a fractional prime stays aligned (the sub-byte
    carry must splice every later chunk)."""
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    c = comp.compress(DATA) + comp.flush()
    first, rest = _strip_bits(c, k)
    inf = Inflate(wbits=-15)
    inf.prime(k, first)
    out = bytearray()
    step = 97  # deliberately odd chunk size
    for i in range(0, len(rest), step):
        last = i + step >= len(rest)
        out += inf.decompress(rest[i:i + step], finish=last)
    assert bytes(out) == DATA


def test_inflate_prime_split_across_two_primes():
    """Two consecutive primes accumulate (8 then 3 bits)."""
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    c = comp.compress(DATA) + comp.flush()
    first, rest = _strip_bits(c, 11)
    inf = Inflate(wbits=-15)
    inf.prime(8, first & 0xFF)
    inf.prime(3, first >> 8)
    assert inf.decompress(rest, finish=True) == DATA


def test_inflate_prime_negative_resets():
    inf = Inflate(wbits=-15)
    inf.prime(5, 0b10101)
    inf.prime(-1, 0)
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    c = comp.compress(DATA) + comp.flush()
    assert inf.decompress(c, finish=True) == DATA


def test_deflate_pending_accounting():
    """deflatePending reflects buffered output: nonzero mid-stream with
    unflushed bits, fully drained after FINISH."""
    d = Deflate(level=6, wbits=-15)
    d.prime(3, 0b101)  # guarantees sub-byte pending bits
    pb, pbits = d.pending()
    assert pbits == 3 and pb == 0
    got = d.compress(DATA[:100])  # small input: may be held for a block
    pb2, pbits2 = d.pending()
    assert (pb2, pbits2) != (None, None)
    out = got + d.compress(DATA[100:], Z_FINISH)
    pb3, pbits3 = d.pending()
    assert pb3 == 0  # everything drained at stream end
    first, rest = _strip_bits(out, 3)
    assert first == 0b101
    assert zlib.decompress(rest, -15) == DATA


def test_deflate_prime_16bit_header_stitch():
    """The documented deflatePrime use: write a custom 16-bit record ahead
    of each member, then stitch members at bit level."""
    d = Deflate(level=1, wbits=-15)
    d.prime(16, 0xBEEF)
    out = d.compress(b"abc" * 500, Z_FINISH)
    assert int.from_bytes(out[:2], "little") == 0xBEEF
    assert zlib.decompress(out[2:], -15) == b"abc" * 500
