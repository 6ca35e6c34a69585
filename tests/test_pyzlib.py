"""zlibng_tpu.pyzlib — drop-in parity with the stdlib zlib module.

Every behavior is checked against CPython's zlib on the same inputs (the
cross-implementation oracle, as in the reference's GZIP_VERIFY interop
tests, test/cmake/compress-and-verify.cmake).
"""
import zlib

import pytest

import zlibng_tpu.pyzlib as pz

DATA = (b"the quick brown fox jumps over the lazy dog " * 300
        + bytes(range(256)) * 40)


def test_module_functions_roundtrip():
    for level in (-1, 1, 6, 9):
        c = pz.compress(DATA, level)
        assert zlib.decompress(c) == DATA
        assert pz.decompress(zlib.compress(DATA, 0 if level < 0 else level)) \
            == DATA
    assert pz.adler32(DATA) == zlib.adler32(DATA)
    assert pz.adler32(DATA, 99) == zlib.adler32(DATA, 99)
    assert pz.crc32(DATA) == zlib.crc32(DATA)
    assert pz.crc32(DATA, 77) == zlib.crc32(DATA, 77)


def test_compressobj_streaming_and_flush_modes():
    co = pz.compressobj(6)
    parts = [co.compress(DATA[i:i + 1000]) for i in range(0, len(DATA), 1000)]
    parts.append(co.flush())
    assert zlib.decompress(b"".join(parts)) == DATA

    co = pz.compressobj(6)
    a = co.compress(DATA[:5000]) + co.flush(pz.Z_SYNC_FLUSH)
    assert a.endswith(b"\x00\x00\xff\xff")
    b = co.compress(DATA[5000:]) + co.flush()
    assert zlib.decompress(a + b) == DATA


def test_compressobj_raw_and_zdict():
    co = pz.compressobj(6, pz.DEFLATED, -15)
    raw = co.compress(DATA) + co.flush()
    assert zlib.decompress(raw, -15) == DATA

    zdict = DATA[:3000]
    co = pz.compressobj(6, pz.DEFLATED, 15, 8, pz.Z_DEFAULT_STRATEGY, zdict)
    c = co.compress(DATA) + co.flush()
    do = zlib.decompressobj(zdict=zdict)
    assert do.decompress(c) + do.flush() == DATA
    # and our decompressobj reads stdlib's zdict output
    co2 = zlib.compressobj(6, zlib.DEFLATED, 15, 8, 0, zdict)
    c2 = co2.compress(DATA) + co2.flush()
    do2 = pz.decompressobj(zdict=zdict)
    assert do2.decompress(c2) + do2.flush() == DATA


def test_decompressobj_dribble_eof_unused():
    zc = zlib.compress(DATA, 6) + b"TRAILING"
    do = pz.decompressobj()
    out = b"".join(do.decompress(zc[i:i + 500])
                   for i in range(0, len(zc), 500))
    out += do.flush()
    assert out == DATA
    assert do.eof
    assert do.unused_data == b"TRAILING"


def test_decompressobj_max_length_loop():
    zc = zlib.compress(DATA, 9)
    do = pz.decompressobj()
    out = bytearray()
    chunk = do.decompress(zc, 777)
    out += chunk
    while chunk:
        assert len(chunk) <= 777
        chunk = do.decompress(do.unconsumed_tail, 777)
        out += chunk
    out += do.flush()
    assert bytes(out) == DATA
    assert do.eof


def test_decompressobj_flush_on_truncated_matches_stdlib():
    zc = zlib.compress(DATA, 6)
    ours, std = pz.decompressobj(), zlib.decompressobj()
    o1 = ours.decompress(zc[:50])
    s1 = std.decompress(zc[:50])
    assert o1 == s1
    assert ours.flush() == std.flush()  # b"" — no raise


def test_copy_semantics():
    co = pz.compressobj(6)
    head = co.compress(DATA[:4000])
    co2 = co.copy()
    tail1 = co.compress(DATA[4000:]) + co.flush()
    tail2 = co2.compress(DATA[4000:]) + co2.flush()
    assert tail1 == tail2
    assert zlib.decompress(head + tail1) == DATA

    zc = zlib.compress(DATA, 6)
    do = pz.decompressobj()
    h = do.decompress(zc[:1000])
    do2 = do.copy()
    t1 = do.decompress(zc[1000:]) + do.flush()
    t2 = do2.decompress(zc[1000:]) + do2.flush()
    assert h + t1 == DATA and t1 == t2


def test_error_compat():
    with pytest.raises(pz.error):
        pz.decompress(b"\x78\x9c" + b"\x00" * 8)
    assert pz.compressBound(100000) >= len(pz.compress(b"\x00" * 100000, 9))
