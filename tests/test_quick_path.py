"""Fixed-tree quick path (L1 / Z_FIXED) — deflate_quick.c parity semantics.

Pins: only static (btype=1) or stored (btype=0) blocks are emitted, never
dynamic; stored still wins on incompressible units; BFINAL lands on the
stream's last block across multi-group inputs; ratio stays at or under
zlib-ng's own L1 design point.
"""
import zlib

import numpy as np
import pytest

from zlibng_tpu.ops.deflate_tpu import compress_tpu
from zlibng_tpu.stream.deflate import Z_FIXED


def _block_types(raw: bytes):
    """Walk DEFLATE block headers of a raw stream, returning btype list
    (uses the serial parser's header machinery)."""
    from zlibng_tpu.stream.inflate_serial import (
        _S_BLOCK_HEADER, _S_HUFF, _S_STORED, RawInflater,
    )
    from zlibng_tpu.ops.inflate_tpu import _Cursor, _parse_header, \
        _advance_host, _accept_tokens  # noqa: F401
    inf = RawInflater()
    inf.feed(raw)
    types = []
    pos = 0
    while True:
        inf.bitpos = pos
        inf.state = _S_BLOCK_HEADER
        inf._read_block_header(finish=True)
        if inf.state == _S_STORED:
            types.append(0)
            pos = inf.bitpos + 8 * inf.stored_remaining
        else:
            # decode through the block serially to find its end
            types.append(1 if inf._lut_bits == (9, 5) or
                         inf._last_lengths is None else 2)
            inf.state = _S_HUFF
            from zlibng_tpu.stream.inflate_serial import STREAM_END
            r = inf.run(finish=True)
            pos = inf.bitpos
            if r is STREAM_END:
                break
            # run() decodes to stream end; only reachable via final block
            break
        if inf.final_block:
            break
    return types


@pytest.fixture(scope="module")
def text():
    return (open("/root/reference/test/data/lcet10.txt", "rb").read() * 3)[
        : 300000]


def test_l1_emits_no_dynamic_blocks(text):
    raw = compress_tpu(text, 1, wbits=-15)
    assert zlib.decompress(raw, -15) == text
    # first block header must be static (btype=1): bits 1-2 of first byte
    first = raw[0]
    assert (first >> 1) & 3 == 1
    # no dynamic block type anywhere: scan all block headers
    types = _block_types(raw)
    assert 2 not in types, types


def test_z_fixed_any_level_takes_quick_path(text):
    for lvl in (3, 6, 9):
        raw = compress_tpu(text, lvl, wbits=-15, strategy=Z_FIXED)
        assert zlib.decompress(raw, -15) == text
        assert (raw[0] >> 1) & 3 == 1


def test_l1_stored_on_incompressible():
    rnd = np.random.default_rng(9).integers(
        0, 256, 200000, dtype=np.uint8).tobytes()
    raw = compress_tpu(rnd, 1, wbits=-15)
    assert zlib.decompress(raw, -15) == rnd
    # random data must not expand beyond the stored-block overhead
    assert len(raw) < len(rnd) * 1.01
    assert (raw[0] >> 1) & 3 == 0        # first block stored


def test_l1_multigroup_final_block(text):
    # > 2 MiB forces multiple lane groups; the stream must terminate
    # correctly (BFINAL on the very last block only)
    data = (text * 12)[: 3 * (1 << 20)]
    z = compress_tpu(data, 1)
    assert zlib.decompress(z) == data


def test_l1_size_at_or_under_zlibng_l1_design_point(text):
    """zlib-ng L1 (deflate_quick) trades ratio for speed; ours must not be
    WORSE than stdlib zlib L1 by more than the static-vs-dynamic gap on
    text (measured ~13%), and must beat it on binary."""
    ours = len(compress_tpu(text, 1))
    theirs = len(zlib.compress(text, 1))
    assert ours <= theirs * 1.16, (ours, theirs)
