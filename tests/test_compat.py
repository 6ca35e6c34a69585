"""zlib-ng-name compat surface + inflateBack callback API."""
import zlib

import numpy as np
import pytest

from zlibng_tpu import compat
from zlibng_tpu.stream.inflate import inflate_back

DATA = b"compat surface exercise data " * 1000


def test_oneshot_names():
    c = compat.compress2(DATA, 6)
    assert zlib.decompress(c) == DATA
    assert compat.uncompress(c) == DATA
    out, consumed = compat.uncompress2(c)
    assert out == DATA and consumed == len(c)
    assert compat.compress(DATA)  # default level


def test_checksums_z_names():
    assert compat.adler32_z(DATA) == zlib.adler32(DATA)
    assert compat.crc32_z(DATA) == zlib.crc32(DATA)
    assert len(compat.get_crc_table()) == 256


def test_version_and_errors():
    assert "2.2.2" in compat.zlibng_version()
    assert compat.z_error(-3) == "data error"
    assert compat.z_error(2) == "need dictionary"
    assert isinstance(compat.zlib_compile_flags(), int)


def test_init_and_params():
    strm = compat.deflate_init(level=4)
    out = strm.compress(DATA[:5000])
    compat.deflate_set_params(strm, level=9)
    out += strm.compress(DATA[5000:], 4)  # Z_FINISH
    assert zlib.decompress(out) == DATA
    p = compat.deflate_get_params(strm)
    assert p["level"] == 9 and p["reproducible"] is True
    inf = compat.inflate_init()
    assert inf.decompress(out, finish=True) == DATA


def test_deflate_bound():
    assert compat.deflate_bound(100_000) >= 100_000


def test_inflate_back():
    comp = zlib.compress(DATA, 9)[2:-4]  # raw deflate
    chunks = [comp[i:i + 777] for i in range(0, len(comp), 777)]
    it = iter(chunks + [b""])
    out = bytearray()
    inflate_back(lambda: next(it), out.extend)
    assert bytes(out) == DATA


def test_inflate_back_with_window():
    dictionary = b"compat surface exercise data "
    c = zlib.compressobj(6, zlib.DEFLATED, -15, 8, 0, dictionary)
    comp = c.compress(DATA) + c.flush()
    it = iter([comp, b""])
    out = bytearray()
    inflate_back(lambda: next(it), out.extend, window=dictionary)
    assert bytes(out) == DATA


def test_reproducible_contract():
    """Z_DEFLATE_REPRODUCIBLE: identical input+params => identical output."""
    a = compat.compress2(DATA, 6)
    b = compat.compress2(DATA, 6)
    assert a == b
