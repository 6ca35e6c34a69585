"""Round-2 parity items vs the reference (VERDICT.md "missing" list):
gzip append mode (gzlib.c:95-180), tight deflateBound (deflate.c:709-781),
data_type TEXT/BINARY detection (trees.c:756-780), real zlibCompileFlags
layout (zlib-ng.h.in:1161-1199, zutil.c), and per-stream window size
enforcement (inflate.c:638-644, 904-911).
"""
import struct
import subprocess
import zlib

import numpy as np
import pytest

from zlibng_tpu.errors import DataError
from zlibng_tpu.stream import deflate as D
from zlibng_tpu.stream.api import Deflate, Inflate
from zlibng_tpu.stream.gzfile import gzopen
from zlibng_tpu.stream.inflate import decompress
from zlibng_tpu.zng import zng_deflateBound, zng_zlibCompileFlags


# ---------------------------------------------------------------------------
# gzip append
# ---------------------------------------------------------------------------
def test_gzopen_append_appends_member(tmp_path):
    p = str(tmp_path / "a.gz")
    with gzopen(p, "wb") as f:
        f.write(b"first part\n")
    with gzopen(p, "ab") as f:
        f.write(b"second part\n")
    # multi-member read joins the members
    with gzopen(p, "rb") as f:
        assert f.read() == b"first part\nsecond part\n"
    # system gzip agrees
    r = subprocess.run(["gzip", "-dc", p], capture_output=True)
    if r.returncode == 0:  # gzip present
        assert r.stdout == b"first part\nsecond part\n"


def test_gzopen_append_on_missing_file_creates(tmp_path):
    p = str(tmp_path / "new.gz")
    with gzopen(p, "a") as f:
        f.write(b"hello")
    with gzopen(p, "rb") as f:
        assert f.read() == b"hello"


# ---------------------------------------------------------------------------
# deflateBound
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_bound_covers_worst_case(level):
    rng = np.random.default_rng(3)
    cases = [b"", b"x", rng.integers(0, 256, 9, np.uint8).tobytes(),
             rng.integers(0, 256, 300_000, np.uint8).tobytes(),
             bytes(200_000), b"ab" * 100_000]
    for data in cases:
        for wbits in (15, -15, 31):
            d = Deflate(level=level, wbits=wbits)
            bound = d.bound(len(data))
            out = d.compress(data, flush=4)
            assert len(out) <= bound, (level, wbits, len(data), len(out), bound)


def test_bound_tight_for_default_params():
    # known-level bound must beat the conservative formula (the reference's
    # default-parameter fast path saves the len/64 term)
    n = 1 << 20
    tight = Deflate(level=6).bound(n)
    conservative = D.compress_bound(n)  # unknown level
    assert tight < conservative
    assert tight <= n + n // 8 + 4 * (n // D.DEFAULT_BLOCK + 1) + 20
    # level 0: ~4% not ~14%
    assert Deflate(level=0).bound(n) < n + n // 16


def test_zng_deflate_bound_wrapper():
    assert zng_deflateBound(None, 1000) >= len(zlib.compress(b"x" * 1000, 6))
    s = Deflate(level=6, wbits=31)
    assert zng_deflateBound(s, 1000) >= len(s.copy().compress(b"y" * 1000, 4))


# ---------------------------------------------------------------------------
# data_type detection
# ---------------------------------------------------------------------------
def test_data_type_text():
    d = Deflate(level=6)
    assert d.data_type == D.Z_UNKNOWN
    d.compress(b"The quick brown fox.\n" * 100, flush=4)
    assert d.data_type == D.Z_TEXT


def test_data_type_binary():
    d = Deflate(level=6)
    d.compress(bytes(range(256)) * 40, flush=4)
    assert d.data_type == D.Z_BINARY


def test_data_type_gray_only_is_binary():
    # BEL/BS/VT/FF/SUB/ESC are gray-listed: alone they read as binary
    d = Deflate(level=6)
    d.compress(bytes([7, 8, 11, 12, 26, 27]) * 50, flush=4)
    assert d.data_type == D.Z_BINARY


def test_data_type_level0_stays_unknown():
    d = Deflate(level=0)
    d.compress(b"plain text here" * 10, flush=4)
    assert d.data_type == D.Z_UNKNOWN


# ---------------------------------------------------------------------------
# zlibCompileFlags
# ---------------------------------------------------------------------------
def test_compile_flags_layout():
    f = zng_zlibCompileFlags()
    # two-bit type-size fields: uint=32 (01), ulong/void*/off_t=64 on this
    # platform (10) — and all option bits clear
    assert f & 3 == 1
    assert (f >> 4) & 3 == 2  # void* is 8 bytes
    assert (f >> 6) & 3 == 2  # 64-bit offsets
    assert f >> 8 == 0


# ---------------------------------------------------------------------------
# window size enforcement
# ---------------------------------------------------------------------------
def _zlib_wrap(raw: bytes, payload: bytes, hwbits: int) -> bytes:
    cmf = 8 | ((hwbits - 8) << 4)
    flg = (0x40 | 0) & 0xE0  # level bits only
    rem = (cmf * 256 + flg) % 31
    if rem:
        flg += 31 - rem
    return bytes([cmf, flg]) + raw + struct.pack(">I", zlib.adler32(payload))


def test_requested_window_smaller_than_header_errors():
    c = zlib.compress(b"hello world" * 50, 6)  # header declares 32K
    with pytest.raises(DataError, match="invalid window size"):
        decompress(c, wbits=9)
    inf = Inflate(wbits=9)
    with pytest.raises(DataError, match="invalid window size"):
        inf.decompress(c, finish=True)
    # oracle agrees
    with pytest.raises(zlib.error):
        zlib.decompress(c, 9)


def test_streaming_enforces_declared_window():
    # raw stream with distances up to ~16K, wrapped in a header declaring
    # a 512-byte window: strict checking must reject it in the STREAMING
    # path too (round-1 hardcoded wbits=15 there)
    data = (b"A unique prefix sentence. " + bytes(16000)
            + b"A unique prefix sentence. ")
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = co.compress(data) + co.flush()
    bogus = _zlib_wrap(raw, data, 9)
    inf = Inflate(wbits=15)
    with pytest.raises(DataError, match="invalid distance too far back"):
        inf.decompress(bogus, finish=True)


def test_honest_small_window_stream_roundtrips():
    data = b"small window data " * 200
    co = zlib.compressobj(6, zlib.DEFLATED, 9)
    c = co.compress(data) + co.flush()
    inf = Inflate(wbits=15)
    out = inf.decompress(c, finish=True)
    assert out == data
    assert decompress(c, wbits=15) == data
    assert decompress(c, wbits=9) == data  # exact request also fine
