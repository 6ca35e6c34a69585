"""Streaming API parity tests (flush modes, dictionaries, copy/reset/prime,
pending, header objects) vs the zlib oracle."""
import zlib

import numpy as np
import pytest

from zlibng_tpu.format.headers import GzipHeader
from zlibng_tpu.stream.api import (
    Deflate, Inflate, Z_FINISH, Z_FULL_FLUSH, Z_NO_FLUSH, Z_PARTIAL_FLUSH,
    Z_SYNC_FLUSH,
)

rng = np.random.default_rng(3)
TEXT = (b"streaming compression with flush modes and state capture " * 2000)


def test_basic_roundtrip():
    d = Deflate(level=6)
    out = d.compress(TEXT) + d.compress(b"", Z_FINISH)
    assert zlib.decompress(out) == TEXT


def test_chunked_input_eager_blocks():
    d = Deflate(level=6)
    out = bytearray()
    for i in range(0, len(TEXT), 1000):
        out += d.compress(TEXT[i:i + 1000])
    out += d.flush()
    assert zlib.decompress(bytes(out)) == TEXT


@pytest.mark.parametrize("mode", [Z_SYNC_FLUSH, Z_FULL_FLUSH, Z_PARTIAL_FLUSH])
def test_flush_modes(mode):
    d = Deflate(level=6)
    out = d.compress(TEXT[:5000], mode)
    if mode == Z_SYNC_FLUSH or mode == Z_FULL_FLUSH:
        # sync marker makes data decodable so far, byte-aligned
        dec = zlib.decompressobj()
        assert dec.decompress(out) == TEXT[:5000]
    out += d.compress(TEXT[5000:], Z_FINISH)
    assert zlib.decompress(out) == TEXT


def test_sync_flush_incremental_consumer():
    d = Deflate(level=6)
    dec = zlib.decompressobj()
    got = bytearray()
    for i in range(0, 30000, 3000):
        chunk = d.compress(TEXT[i:i + 3000], Z_SYNC_FLUSH)
        got += dec.decompress(chunk)
    assert bytes(got) == TEXT[:30000]


def test_full_flush_resets_history():
    d = Deflate(level=6)
    a = d.compress(TEXT[:40000], Z_FULL_FLUSH)
    b = d.compress(TEXT[:40000], Z_FINISH)  # same data again
    assert zlib.decompress(a + b) == TEXT[:40000] * 2


def test_deflate_copy_diverges():
    d = Deflate(level=6)
    pre = d.compress(TEXT[:10000], Z_SYNC_FLUSH)
    d2 = d.copy()
    out1 = pre + d.compress(b"AAA", Z_FINISH)
    out2 = pre + d2.compress(b"BBB", Z_FINISH)
    assert zlib.decompress(out1).endswith(b"AAA")
    assert zlib.decompress(out2).endswith(b"BBB")


def test_gzip_mode_with_header():
    import gzip as gz
    d = Deflate(wbits=31)
    d.set_header(GzipHeader(name=b"f.txt", time=123456, comment=b"hi"))
    out = d.compress(TEXT, Z_FINISH)
    assert gz.decompress(out) == TEXT
    # and our Inflate reads the header back
    inf = Inflate(wbits=31)
    got = inf.decompress(out, finish=True)
    assert got == TEXT and inf.eof
    assert inf.get_header().name == b"f.txt"
    assert inf.get_header().time == 123456


def test_raw_mode():
    d = Deflate(wbits=-15)
    out = d.compress(TEXT, Z_FINISH)
    assert zlib.decompress(out, -15) == TEXT


def test_dictionary_stream():
    dictionary = b"the quick brown fox jumps over the lazy dog"
    d = Deflate(level=6)
    d.set_dictionary(dictionary)
    data = b"a quick brown fox jumped over lazy dogs " * 50
    out = d.compress(data, Z_FINISH)
    dec = zlib.decompressobj(zdict=dictionary)
    assert dec.decompress(out) == data
    # our side
    inf = Inflate()
    try:
        inf.decompress(out, finish=True)
        raise AssertionError("expected NeedDictError")
    except Exception as e:
        from zlibng_tpu.errors import NeedDictError
        assert isinstance(e, NeedDictError)
    inf.set_dictionary(dictionary)
    assert inf.decompress(b"", finish=True) == data


def test_inflate_streaming_chunks():
    comp = zlib.compress(TEXT, 9)
    inf = Inflate()
    out = bytearray()
    for i in range(0, len(comp), 501):
        out += inf.decompress(comp[i:i + 501], finish=(i + 501 >= len(comp)))
    assert bytes(out) == TEXT
    assert inf.eof
    assert inf.total_out == len(TEXT)


def test_inflate_mark_and_codes_used():
    comp = zlib.compress(TEXT)
    inf = Inflate()
    inf.decompress(comp, finish=True)
    bits, outpos = inf.mark()
    assert outpos == len(TEXT)
    assert inf.codes_used() > 0


def test_inflate_sync_resync():
    """Corrupt the first deflate block, resync at the full-flush marker."""
    d = Deflate(level=6, wbits=-15)
    part1 = d.compress(b"first block data " * 100, Z_FULL_FLUSH)
    part2 = d.compress(b"second block data " * 100, Z_FINISH)
    corrupted = b"\xde\xad" + part1[-4:] + part2  # garbage, then marker+rest
    inf = Inflate(wbits=-15)
    try:
        inf.decompress(corrupted, finish=False)
    except Exception:
        pass
    assert inf.sync()
    out = inf.decompress(b"", finish=True)
    assert b"second block data" in out


def test_pending_and_prime():
    d = Deflate(wbits=-15)
    d.prime(5, 0b10101)
    out = d.compress(b"xyz", Z_FINISH)
    # first 5 bits of the stream are the primed bits
    assert out[0] & 0x1F == 0b10101
    # inflate side: skip 5 bits via prime... round-trip through raw decode
    inf = Inflate(wbits=-15)
    # feed without the primed bits is invalid; verify bits manually instead
    d2 = Deflate(wbits=-15)
    ref = d2.compress(b"xyz", Z_FINISH)
    # stream after removing 5 bits == ref
    joined = int.from_bytes(out, "little") >> 5
    assert joined == int.from_bytes(ref, "little")


def test_deflate_params_midstream():
    d = Deflate(level=1)
    out = d.compress(TEXT[:30000])
    d.params(9)
    out += d.compress(TEXT[30000:], Z_FINISH)
    assert zlib.decompress(out) == TEXT


def test_reset_reuse():
    d = Deflate(level=6)
    a = d.compress(b"hello", Z_FINISH)
    d.reset()
    b = d.compress(b"hello", Z_FINISH)
    assert a == b
    inf = Inflate()
    assert inf.decompress(a, finish=True) == b"hello"
    inf.reset()
    assert inf.decompress(b, finish=True) == b"hello"


def test_inflate_copy():
    comp = zlib.compress(TEXT)
    inf = Inflate()
    inf.decompress(comp[:200])
    inf2 = inf.copy()
    a = inf.decompress(comp[200:], finish=True)
    b = inf2.decompress(comp[200:], finish=True)
    assert a == b


def test_auto_detect_stream():
    import gzip as gz
    for blob in (zlib.compress(TEXT), gz.compress(TEXT)):
        inf = Inflate(wbits=47)
        assert inf.decompress(blob, finish=True) == TEXT


def test_deflate_tune_per_stream():
    """deflateTune overrides are per-stream (deflate.c:679-690 stores them
    in deflate_state): tuning one stream must not change another's output
    or the global level table."""
    from zlibng_tpu.stream import deflate as D
    before = dict(D.LEVELS)
    d1 = Deflate(level=6)
    d1.tune(8, 4, 16, 2)  # good, lazy, nice, chain — much weaker matching
    out_tuned = d1.compress(TEXT, Z_FINISH)
    assert zlib.decompress(out_tuned) == TEXT
    assert D.LEVELS == before  # no global leak
    d2 = Deflate(level=6)
    out_default = d2.compress(TEXT, Z_FINISH)
    assert zlib.decompress(out_default) == TEXT
    # weaker tuning should not produce smaller output than the default
    assert len(out_tuned) >= len(out_default)
