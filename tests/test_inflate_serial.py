"""Serial inflate conformance vs the zlib oracle (bit-compatible w/ zlib-ng)."""
import gzip as gzip_mod
import os
import zlib

import numpy as np
import pytest

from zlibng_tpu.stream.inflate import decompress, decompress_member, gzip_decompress
from zlibng_tpu.stream.inflate_serial import (
    InflateError, RawInflater, STREAM_END, inflate_raw,
)

rng = np.random.default_rng(123)


def make_corpus():
    cases = {
        "empty": b"",
        "single": b"x",
        "hello": b"hello hello hello world world world",
        "zeros": bytes(100_000),
        "random": bytes(rng.integers(0, 256, 60_000, dtype=np.uint8)),
        "text": (b"the quick brown fox jumps over the lazy dog. " * 3000),
        "overlap": b"ab" * 50_000,  # dist<len overlapping copies
        "alternating": bytes(rng.integers(0, 4, 80_000, dtype=np.uint8)),
    }
    ref = "/root/reference/doc/rfc1951.txt"
    if os.path.exists(ref):
        cases["rfc1951"] = open(ref, "rb").read()
    return cases


CORPUS = make_corpus()


@pytest.mark.parametrize("name", CORPUS)
@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_raw_inflate_zlib_output(name, level):
    data = CORPUS[name]
    comp = zlib.compress(data, level)[2:-4]  # strip zlib wrapper -> raw
    out, _ = inflate_raw(comp)
    assert out == data


@pytest.mark.parametrize("name", CORPUS)
def test_zlib_wrapper(name):
    data = CORPUS[name]
    assert decompress(zlib.compress(data, 6)) == data


@pytest.mark.parametrize("name", CORPUS)
def test_gzip_wrapper(name):
    data = CORPUS[name]
    assert decompress(gzip_mod.compress(data, 6), wbits=31) == data


def test_auto_detect():
    data = CORPUS["text"]
    assert decompress(zlib.compress(data), wbits=47) == data
    assert decompress(gzip_mod.compress(data), wbits=47) == data


def test_stored_blocks():
    data = CORPUS["random"]  # incompressible -> stored blocks at level 0
    comp = zlib.compress(data, 0)
    assert decompress(comp) == data


def test_fixed_blocks():
    # small inputs typically get fixed-tree blocks
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = c.compress(b"abcabcabc") + c.flush()
    out, _ = inflate_raw(comp)
    assert out == b"abcabcabc"


def test_streaming_byte_dribble():
    """Feed 1 byte at a time (test_small_buffers analog)."""
    data = CORPUS["text"]
    comp = zlib.compress(data, 9)[2:-4]
    inf = RawInflater()
    r = None
    for i in range(len(comp)):
        inf.feed(comp[i:i + 1])
        r = inf.run(finish=(i == len(comp) - 1))
    assert r == STREAM_END
    assert inf.output() == data


def test_streaming_random_chunks():
    data = CORPUS["alternating"]
    comp = zlib.compress(data, 6)[2:-4]
    inf = RawInflater()
    pos = 0
    while pos < len(comp):
        n = int(rng.integers(1, 4096))
        inf.feed(comp[pos:pos + n])
        pos += n
        inf.run(finish=(pos >= len(comp)))
    assert inf.output() == data


def test_preset_dictionary():
    dictionary = b"the quick brown fox jumps over the lazy dog"
    data = b"a quick brown fox and a lazy dog meet the quick brown fox"
    c = zlib.compressobj(6, zlib.DEFLATED, 15, 8, zlib.Z_DEFAULT_STRATEGY, dictionary)
    comp = c.compress(data) + c.flush()
    # python zlib with zdict does NOT emit FDICT; decompressobj needs the dict
    d = zlib.decompressobj(zdict=dictionary)
    assert d.decompress(comp) == data  # oracle sanity
    # zdict makes zlib emit FDICT + 4-byte DICTID: header is 6 bytes
    out, _ = inflate_raw(comp[6:-4], dictionary=dictionary)
    assert out == data
    # and via the wrapper-aware path (FDICT flow)
    assert decompress(comp, dictionary=dictionary) == data


def test_multi_member_gzip():
    a, b = CORPUS["hello"], CORPUS["text"][:1000]
    blob = gzip_mod.compress(a) + gzip_mod.compress(b)
    assert gzip_decompress(blob) == a + b


def test_gzip_header_fields():
    import io
    buf = io.BytesIO()
    with gzip_mod.GzipFile(fileobj=buf, mode="wb", filename="hello.txt", mtime=1234567) as f:
        f.write(b"payload data here")
    r = decompress_member(buf.getvalue(), wbits=31)
    assert r.data == b"payload data here"
    assert r.gzip_header.name == b"hello.txt"
    assert r.gzip_header.time == 1234567


# --- corruption / validation (CVE-class behavior) --------------------------
def test_bad_block_type():
    # BFINAL=1, BTYPE=3 -> invalid
    with pytest.raises(InflateError, match="invalid block type"):
        inflate_raw(bytes([0b111]))


def test_stored_length_mismatch():
    bad = bytes([0b000, 0x05, 0x00, 0x12, 0x34]) + bytes(5)
    with pytest.raises(InflateError, match="invalid stored block lengths"):
        inflate_raw(bad)


def test_distance_too_far():
    # hand-build: fixed block, literal 'a', then match dist=4096 (> history)
    from zlibng_tpu.utils.bitwriter import BitWriter
    from zlibng_tpu.format.constants import (
        FIXED_LIT_CODES_REV, FIXED_LIT_LENGTHS, FIXED_DIST_CODES_REV,
        FIXED_DIST_LENGTHS,
    )
    bw = BitWriter()
    bw.write(1, 1)  # BFINAL
    bw.write(1, 2)  # fixed
    bw.write(int(FIXED_LIT_CODES_REV[ord("a")]), int(FIXED_LIT_LENGTHS[ord("a")]))
    sym = 257  # length 3
    bw.write(int(FIXED_LIT_CODES_REV[sym]), int(FIXED_LIT_LENGTHS[sym]))
    dcode = 24  # base 4097
    bw.write(int(FIXED_DIST_CODES_REV[dcode]), int(FIXED_DIST_LENGTHS[dcode]))
    bw.write(0, 11)  # extra bits
    with pytest.raises(InflateError, match="too far back"):
        inflate_raw(bw.getvalue() + bytes(8))


def test_truncated_stream():
    comp = zlib.compress(CORPUS["text"], 6)[2:-4]
    with pytest.raises(InflateError, match="unexpected end"):
        inflate_raw(comp[: len(comp) // 2])


def test_bad_zlib_checksum():
    comp = bytearray(zlib.compress(b"hello world"))
    comp[-1] ^= 0xFF
    with pytest.raises(InflateError, match="incorrect data check"):
        decompress(bytes(comp))


def test_bad_gzip_crc():
    comp = bytearray(gzip_mod.compress(b"hello world"))
    comp[-6] ^= 0xFF  # crc field
    with pytest.raises(InflateError, match="incorrect data check"):
        decompress(bytes(comp), wbits=31)


def test_bad_zlib_header():
    with pytest.raises(InflateError, match="incorrect header check"):
        decompress(b"\x78\x00" + bytes(10))


def test_oversubscribed_dynamic():
    """Oversubscribed code-length set must be rejected (CVE-class input)."""
    from zlibng_tpu.utils.bitwriter import BitWriter
    bw = BitWriter()
    bw.write(1, 1)
    bw.write(2, 2)    # dynamic
    bw.write(0, 5)    # hlit = 257
    bw.write(0, 5)    # hdist = 1
    bw.write(15, 4)   # hclen = 19
    for _ in range(19):
        bw.write(1, 3)  # nineteen 1-bit codes: massively oversubscribed
    with pytest.raises(InflateError, match="invalid code lengths set"):
        inflate_raw(bw.getvalue() + bytes(16))
