"""infcover-style malformed-stream coverage (reference test/infcover.c):
hand-crafted bitstreams driving every decoder rejection branch, plus a
seeded fuzz sweep (reference test/fuzz targets)."""
import zlib

import numpy as np
import pytest

from zlibng_tpu.errors import DataError
from zlibng_tpu.stream.inflate_serial import RawInflater, inflate_raw
from zlibng_tpu.utils.bitwriter import BitWriter


def dyn_header(hlit=257, hdist=1, hclen=19, cl_lengths=None):
    bw = BitWriter()
    bw.write(1, 1)          # BFINAL
    bw.write(2, 2)          # dynamic
    bw.write(hlit - 257, 5)
    bw.write(hdist - 1, 5)
    bw.write(hclen - 4, 4)
    from zlibng_tpu.format.constants import BL_ORDER
    cl = cl_lengths or {}
    for i in range(hclen):
        bw.write(cl.get(int(BL_ORDER[i]), 0), 3)
    return bw


def test_hlit_too_large():
    # HLIT=287 > 286
    bw = BitWriter()
    bw.write(1, 1)
    bw.write(2, 2)
    bw.write(30, 5)   # hlit = 287
    bw.write(0, 5)
    bw.write(15, 4)
    with pytest.raises(DataError, match="too many length or distance symbols"):
        inflate_raw(bw.getvalue() + bytes(16))


def test_rep16_first():
    # code-length tree: sym16 len1, sym0 len1; first emitted code is 16
    bw = dyn_header(cl_lengths={16: 1, 0: 1})
    bw.write(0b0, 1)  # wait: canonical codes: sym0 -> 0, sym16 -> 1
    # emit symbol 16 first (code '1'), rep of previous with none before
    bw2 = dyn_header(cl_lengths={16: 1, 0: 1})
    bw2.write(1, 1)   # symbol 16
    bw2.write(0, 2)   # repeat count bits
    with pytest.raises(DataError, match="invalid bit length repeat"):
        inflate_raw(bw2.getvalue() + bytes(16))


def test_missing_end_of_block():
    # lit/len lengths: sym 'a'=1bit, sym 'b'=1bit, EOB length 0
    bw = dyn_header(cl_lengths={1: 2, 18: 2, 17: 2, 0: 2})
    # cl codes (len 2 each, canonical by symbol order): 0->00? symbols with
    # len2: 0,1,17,18 -> codes 00,01,10,11 (then bit-reversed on emit)
    def emit_cl(sym):
        order = {0: 0b00, 1: 0b01, 17: 0b10, 18: 0b11}
        code = order[sym]
        bw.write(int(f"{code:02b}"[::-1], 2), 2)  # LSB-first
    emit_cl(1)            # length 1 for symbol 0 ('\x00' literal)
    emit_cl(1)            # length 1 for symbol 1
    # zeros for the rest: 18 = repeat zero 11-138
    remaining = 257 - 2
    while remaining > 0:
        take = min(remaining, 138)
        if take < 11:
            for _ in range(take):
                emit_cl(0)
            remaining = 0
        else:
            emit_cl(18)
            bw.write(take - 11, 7)
            remaining -= take
    emit_cl(18)           # hdist=1 zero length... 1 entry: use 0
    with pytest.raises(DataError):
        inflate_raw(bw.getvalue() + bytes(16))


def test_single_incomplete_dist_code_accepted():
    """One dist code of length 1 (incomplete tree) must be ACCEPTED
    (inftrees.c max==1 exemption) as long as the other half is unused."""
    # easiest: produce via zlib itself on data with a single distance
    data = b"abcabcabc"
    comp = zlib.compress(data, 9)[2:-4]
    out, _ = inflate_raw(comp)
    assert out == data


def test_stored_block_truncated_length():
    bw = BitWriter()
    bw.write(1, 1)
    bw.write(0, 2)
    bw.align()
    blob = bw.getvalue() + b"\x10\x00\xef\xff"  # LEN=16, only 3 bytes follow
    with pytest.raises(DataError, match="unexpected end"):
        inflate_raw(blob + b"abc")


def test_len258_maxdist_roundtrip():
    """Edge symbols: max length + max distance decode correctly."""
    data = bytes(np.random.default_rng(0).integers(0, 256, 32768, dtype=np.uint8))
    data = data + bytes(10) + data[:300]  # guarantees long far matches
    comp = zlib.compress(data, 9)
    out, _ = inflate_raw(comp[2:-4])
    assert out == data


SEEDS = range(6)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_garbage_never_crashes(seed):
    """fuzzer_*-style: arbitrary bytes must raise DataError, never crash."""
    rng = np.random.default_rng(seed)
    for _ in range(30):
        blob = rng.integers(0, 256, int(rng.integers(1, 2000)),
                            dtype=np.uint8).tobytes()
        inf = RawInflater()
        inf.feed(blob)
        try:
            inf.run(finish=True)
        except DataError:
            pass


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_roundtrip(seed):
    """compress∘uncompress == id on random structured data
    (fuzzer_compress.c:14-23 analog)."""
    from zlibng_tpu.stream.deflate import compress
    from zlibng_tpu.stream.inflate import decompress
    rng = np.random.default_rng(100 + seed)
    alphabet = rng.integers(0, 256, 8, dtype=np.uint8)
    data = alphabet[rng.integers(0, 8, int(rng.integers(0, 50_000)))].tobytes()
    level = int(rng.integers(0, 10))
    c = compress(data, level)
    assert zlib.decompress(c) == data
    assert decompress(c) == data


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_truncated_valid_streams(seed):
    """Truncations of valid streams must error cleanly, never hang/crash."""
    rng = np.random.default_rng(200 + seed)
    data = bytes(rng.integers(0, 64, 5000, dtype=np.uint8))
    comp = zlib.compress(data, 6)[2:-4]
    for cut in rng.integers(0, max(1, len(comp)), 10):
        inf = RawInflater()
        inf.feed(comp[:int(cut)])
        try:
            inf.run(finish=True)
        except DataError:
            pass
