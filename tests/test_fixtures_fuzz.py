"""Hostile-fixture regression corpus + structured fuzzing.

Fixtures under tests/fixtures/ are binary test DATA imported from the
reference tree (test/cmake/test-cves.cmake, test-issues.cmake): the four
inflate CVE reproducers (CVE-2002-0059, 2004-0797, 2005-1849, 2005-2096),
the CVE-2018-25032 compress memory-corruption inputs, and the GH-issue
data files. The fuzz loop mirrors test/fuzz/fuzzer_compress.c:14-23
(compress∘uncompress == id) plus a decode mutation sweep.
"""
import glob
import gzip as _gzip
import os
import zlib

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from zlibng_tpu.errors import DataError
from zlibng_tpu.ops import inflate_tpu as itpu
from zlibng_tpu.stream.api import Deflate, Inflate, Z_FINISH, Z_SYNC_FLUSH
from zlibng_tpu.stream.deflate import Z_FIXED, compress
from zlibng_tpu.stream.inflate import decompress, gzip_decompress

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

_CVES = ["CVE-2002-0059", "CVE-2004-0797", "CVE-2005-1849", "CVE-2005-2096"]


@pytest.mark.parametrize("cve", _CVES)
def test_cve_gz_fixtures_rejected_cleanly(cve):
    """The hostile .gz inputs must raise Z_DATA_ERROR (never crash/hang),
    like minigzip -d exiting 0/1 in the reference harness."""
    blob = open(os.path.join(FIX, cve, "test.gz"), "rb").read()
    # oracle agrees these are corrupt
    with pytest.raises(zlib.error):
        _gzip.decompress(blob)
    with pytest.raises(DataError):
        decompress(blob, wbits=31)
    # device/batch engine: same rejection (falls back for the exact message)
    with pytest.raises(DataError):
        itpu.decompress_tpu(blob, wbits=31)
    # streaming path
    inf = Inflate(wbits=31)
    with pytest.raises(DataError):
        inf.decompress(blob, finish=True)


@pytest.mark.parametrize("name,level", [("fixed.txt", 6), ("fixed.txt", 1),
                                        ("fixed.txt", 2), ("default.txt", 6),
                                        ("default.txt", 1)])
def test_cve_2018_25032_configs(name, level):
    """CVE-2018-25032 inputs under the vulnerable config: memLevel=1,
    raw -15; fixed.txt additionally with Z_FIXED strategy."""
    data = open(os.path.join(FIX, "CVE-2018-25032", name), "rb").read()
    strat = Z_FIXED if name == "fixed.txt" else 0
    d = Deflate(level=level, wbits=-15, mem_level=1, strategy=strat)
    comp = d.compress(data, flush=Z_FINISH)
    assert zlib.decompress(comp, -15) == data


def test_gh361_level4_roundtrip():
    data = open(os.path.join(FIX, "GH-361", "test.txt"), "rb").read()
    comp = compress(data, level=4, wbits=31)
    assert _gzip.decompress(comp) == data


def test_gh364_switchlevels():
    """switchlevels 1 5 9 3 analog: deflateParams mid-stream."""
    data = open(os.path.join(FIX, "GH-364", "test.bin"), "rb").read()
    big = data * 4000  # make each level segment non-trivial
    d = Deflate(level=1, wbits=15)
    out = d.compress(big[:8000], flush=Z_SYNC_FLUSH)
    for lvl, lo, hi in ((5, 8000, 16000), (9, 16000, 24000),
                        (3, 24000, len(big))):
        d.params(lvl)
        out += d.compress(big[lo:hi], flush=Z_SYNC_FLUSH)
    out += d.compress(b"", flush=Z_FINISH)
    assert zlib.decompress(out) == big


def test_gh382_defneg3_fixed_strategy():
    data = open(os.path.join(FIX, "GH-382", "defneg3.dat"), "rb").read()
    d = Deflate(level=1, wbits=-15, mem_level=1, strategy=Z_FIXED)
    comp = d.compress(data, flush=Z_FINISH)
    assert zlib.decompress(comp, -15) == data


def test_gh751_roundtrip_all_levels():
    data = open(os.path.join(FIX, "GH-751", "test.txt"), "rb").read()
    for level in (1, 6, 9):
        comp = compress(data, level=level)
        assert zlib.decompress(comp) == data


def test_gh979_pigz_tarball():
    blob = open(os.path.join(FIX, "GH-979", "pigz-2.6.tar.gz"), "rb").read()
    expect = _gzip.decompress(blob)
    assert gzip_decompress(blob) == expect
    assert itpu.decompress_tpu(blob, wbits=31) == expect


def test_gh1600_packobj_is_zlib():
    blob = open(os.path.join(FIX, "GH-1600", "packobj.gz"), "rb").read()
    expect = zlib.decompress(blob)
    assert decompress(blob) == expect


# ---------------------------------------------------------------------------
# structured fuzzing (fuzzer_compress.c analog, hypothesis-driven)
# ---------------------------------------------------------------------------
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=st.binary(max_size=4096),
       level=st.integers(0, 9),
       strategy=st.sampled_from([0, 1, 2, 3, 4]),
       wbits=st.sampled_from([15, 12, 9, -15, -9, 31]))
def test_fuzz_compress_roundtrip(data, level, strategy, wbits):
    comp = compress(data, level=level, wbits=wbits, strategy=strategy)
    if wbits < 0:
        out = zlib.decompress(comp, wbits)
    elif wbits > 15:
        out = _gzip.decompress(comp)
    else:
        out = zlib.decompress(comp)
    assert out == data


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=st.binary(min_size=1, max_size=2048),
       seed=st.integers(0, 2**31 - 1))
def test_fuzz_decode_mutations(data, seed):
    """Bit-flip valid streams: decode must return or raise DataError —
    never crash, hang, or emit a checksum-passing wrong answer."""
    comp = bytearray(zlib.compress(data, 6))
    rng = np.random.default_rng(seed)
    for _ in range(3):
        i = int(rng.integers(0, len(comp)))
        comp[i] ^= int(rng.integers(1, 256))
    blob = bytes(comp)
    try:
        out = decompress(blob)
    except DataError:
        out = None
    # oracle cross-check: if the oracle accepts, we must match it
    try:
        oracle = zlib.decompress(blob)
    except zlib.error:
        oracle = None
    if oracle is not None and out is not None:
        assert out == oracle


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(junk=st.binary(min_size=2, max_size=512))
def test_fuzz_garbage_input(junk):
    try:
        decompress(junk)
    except DataError:
        pass
    try:
        decompress(junk, wbits=-15)
    except DataError:
        pass
