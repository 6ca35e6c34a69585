"""Z_BLOCK / Z_TREES inflate semantics (inflate.c:402-520 doc; stop sites
at inflate.c:722,746,773,920; data_type formula inflate.c:1191).

Streams with known block structure are built with zlib flush modes, then
stepped block-by-block; outputs, boundary flags, and bit positions are
checked against the known structure and the zlib oracle's full decode.
"""
import zlib

import pytest

from zlibng_tpu.stream.api import Inflate, Z_BLOCK, Z_FINISH, Z_TREES


def _three_block_zlib():
    """zlib stream with 3 deflate blocks at known output splits."""
    co = zlib.compressobj(6)
    parts = [b"first block of text " * 50,
             b"second block, different content " * 40,
             b"third and final block " * 30]
    out = co.compress(parts[0]) + co.flush(zlib.Z_FULL_FLUSH)
    out += co.compress(parts[1]) + co.flush(zlib.Z_FULL_FLUSH)
    out += co.compress(parts[2]) + co.flush(zlib.Z_FINISH)
    return out, parts


def test_z_block_steps_block_by_block():
    comp, parts = _three_block_zlib()
    inf = Inflate(wbits=15)
    # first call: header only — stops at the pre-first-block boundary
    chunk = inf.decompress(comp, flush=Z_BLOCK)
    assert chunk == b""
    assert inf.data_type & 128
    assert not inf.data_type & 64
    # step through every block; collect output
    got = bytearray()
    boundaries = 0
    for _ in range(64):
        chunk = inf.decompress(b"", flush=Z_BLOCK)
        got += chunk
        if inf.eof:
            break
        assert inf.data_type & 128  # each stop is a block boundary
        boundaries += 1
    assert bytes(got) == b"".join(parts)
    assert inf.eof
    # full-flush pairs = (real block + empty stored) per part, minus final
    assert boundaries >= 3


def test_z_block_data_type_last_block_flag():
    data = b"tiny"
    comp = zlib.compress(data, 6)
    inf = Inflate(wbits=15)
    inf.decompress(comp, flush=Z_BLOCK)       # header
    out = inf.decompress(b"", flush=Z_BLOCK)  # single (final) block
    assert out == data
    assert inf.data_type & 64                 # in the last block
    # unused-bits field is sub-byte at boundary stops
    assert (inf.data_type & 63) < 8


def test_z_trees_stops_after_each_header():
    comp, parts = _three_block_zlib()
    inf = Inflate(wbits=15)
    inf.decompress(comp, flush=Z_TREES)       # wrapper header
    assert inf.data_type & 128
    # next stop: after the first block's Huffman tables, BEFORE any data
    out = inf.decompress(b"", flush=Z_TREES)
    assert out == b""
    assert inf.data_type & 256
    assert (inf.data_type & 63) < 8
    # resume normally: everything decodes
    rest = inf.decompress(b"", finish=False)
    while not inf.eof:
        more = inf.decompress(b"", flush=Z_FINISH)
        rest += more
    assert out + rest == b"".join(parts)


def test_z_trees_random_access_header_lengths():
    # Z_TREES exists so callers can measure deflate block header lengths
    # (rsync/zran-style indexing): the bit position after a TREES stop must
    # sit strictly between the boundary position and the first symbol's end
    import numpy as np
    varied = np.random.default_rng(0).integers(
        32, 127, 60_000, np.uint8).tobytes()  # forces a dynamic block
    comp = zlib.compress(varied, 6)
    inf = Inflate(wbits=15)
    inf.decompress(comp, flush=Z_TREES)
    pos0 = inf._raw.bitpos
    inf.decompress(b"", flush=Z_TREES)
    pos1 = inf._raw.bitpos
    assert pos1 > pos0 + 17  # 3 header bits + HLIT/HDIST/HCLEN + code lens
    # fixed blocks stop right after the 3 header bits (inflate.c:746-748)
    co = zlib.compressobj(6, zlib.DEFLATED, 15, 8, zlib.Z_FIXED)
    comp2 = co.compress(b"zz") + co.flush()
    inf2 = Inflate(wbits=15)
    inf2.decompress(comp2, flush=Z_TREES)
    inf2.decompress(b"", flush=Z_TREES)
    assert inf2._raw.bitpos == 3 and inf2.data_type & 256


def test_z_block_stored_blocks():
    # level 0 → stored blocks; Z_BLOCK still steps per block
    data = bytes(range(256)) * 300  # > 64KiB → several stored blocks
    comp = zlib.compress(data, 0)
    inf = Inflate(wbits=15)
    inf.decompress(comp, flush=Z_BLOCK)
    got = bytearray()
    steps = 0
    while not inf.eof and steps < 100:
        got += inf.decompress(b"", flush=Z_BLOCK)
        steps += 1
    assert bytes(got) == data
    assert steps >= 2  # multiple stored blocks stepped


def test_normal_decode_sets_data_type():
    comp = zlib.compress(b"abc" * 1000, 6)
    inf = Inflate(wbits=15)
    out = inf.decompress(comp, finish=True)
    assert out == b"abc" * 1000
    assert inf.data_type & 64  # finished inside the final block


def test_gzip_mode_z_block():
    import gzip as _gz
    data = b"gzip framed payload " * 100
    comp = _gz.compress(data, 6)
    inf = Inflate(wbits=31)
    first = inf.decompress(comp, flush=Z_BLOCK)
    assert first == b"" and inf.data_type & 128
    got = bytearray()
    for _ in range(64):
        got += inf.decompress(b"", flush=Z_BLOCK)
        if inf.eof:
            break
    assert bytes(got) == data
