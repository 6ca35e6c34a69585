"""Multi-chip (virtual 8-device CPU mesh) dynamic-Huffman compression and
sharded batch decode — VERDICT round-1 item 5.

Pins: the shard_map pipeline emits real dynamic blocks (not static-only),
its output is standard zlib (oracle: the zlib C module), its ratio tracks
the single-chip pipeline, and the sharded phase A/B decode reconstructs
full-flush segments bit-exactly.
"""
import zlib

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from zlibng_tpu.parallel.sharded import (
    compress_multichip, decompress_segments_multichip,
)
from zlibng_tpu.stream.deflate import compress as compress_host


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (conftest)")
    return Mesh(np.array(devs[:8]), ("d",))


@pytest.fixture(scope="module")
def corpus():
    return open("/root/reference/test/data/lcet10.txt", "rb").read()[:131072]


def test_multichip_dynamic_roundtrip_and_ratio(mesh, corpus):
    z = compress_multichip(corpus, mesh, level=6, lane_block=16384)
    assert zlib.decompress(z) == corpus
    # ratio must track zlib level 6 on the same data (per-lane trees cost
    # a little; 8% covers the per-16K header overhead with margin)
    assert len(z) <= int(len(zlib.compress(corpus, 6)) * 1.08)


def test_multichip_emits_dynamic_blocks(mesh, corpus):
    z = compress_multichip(corpus, mesh, level=6, lane_block=16384)
    # dynamic block type (btype=2) must appear: read the first block header
    # bits directly (after the 2-byte zlib header): bit0 BFINAL, bits1-2 type
    first = z[2]
    btype = (first >> 1) & 3
    assert btype == 2, f"expected a dynamic first block, got btype={btype}"


def test_multichip_adler_exact(mesh, corpus):
    z = compress_multichip(corpus, mesh, level=6, lane_block=16384)
    # trailer adler comes from the device combine tree; zlib.decompress
    # verifies it — additionally pin the exact value
    import struct
    assert struct.unpack(">I", z[-4:])[0] == zlib.adler32(corpus)


def test_sharded_segment_decode(mesh, corpus):
    from zlibng_tpu.ops import inflate_tpu as IT
    segs = [corpus[i:i + 16384] for i in range(0, len(corpus), 16384)]
    blob = b""
    starts = []
    for s in segs:
        starts.append(len(blob))
        blob += compress_host(s, level=6, wbits=-15)
    mesh_before = IT.stats["mesh_ok"]
    fb_before = IT.stats["fallback"]
    outs = decompress_segments_multichip(blob, starts, mesh)
    assert b"".join(outs) == corpus
    assert len(outs) == len(segs)
    for o, s in zip(outs, segs):
        assert o == s
    # the mesh phase A/B path must have actually executed — a fallback to
    # the single-device engine (round-2 weak #1) is a FAILURE, not a pass
    assert IT.stats["mesh_ok"] == mesh_before + 1, "mesh decode fell back"
    assert IT.stats["fallback"] == fb_before


def test_multichip_stored_choice_incompressible(mesh):
    """Round-4 verdict #5: an incompressible lane must come out as raw
    stored blocks (deflate_stored.c / trees.c:657-692 analog), not a
    ~8.004-bit/byte Huffman block."""
    rnd = np.random.default_rng(0xFEED).integers(
        0, 256, 5 * 16384 + 321, dtype=np.uint8).tobytes()
    z = compress_multichip(rnd, mesh, level=6, lane_block=16384)
    assert zlib.decompress(z) == rnd
    assert len(z) <= int(len(rnd) * 1.001) + 64, (len(z), len(rnd))


def test_multichip_mixed_stored_and_dynamic(mesh, corpus):
    """Text lanes go Huffman while random lanes go stored, in one stream."""
    rnd = np.random.default_rng(5).integers(
        0, 256, 2 * 16384, dtype=np.uint8).tobytes()
    data = corpus[:2 * 16384] + rnd + corpus[2 * 16384:4 * 16384]
    z = compress_multichip(data, mesh, level=6, lane_block=16384)
    assert zlib.decompress(z) == data
    # random middle stored (~len), text compressed (~0.4x): total well
    # below all-Huffman-random and above all-text sizes
    assert len(z) < len(rnd) + int(0.6 * (len(data) - len(rnd)))


def test_multichip_corrupt_stream_raises(mesh, corpus):
    """Round-4 verdict #6: a real stream error propagates from the mesh
    path (exact message), with no second single-device decode."""
    from zlibng_tpu.errors import DataError
    from zlibng_tpu.ops import inflate_tpu as IT
    segs = [corpus[i:i + 16384] for i in range(0, 4 * 16384, 16384)]
    blob = b""
    starts = []
    for s in segs:
        starts.append(len(blob))
        blob += compress_host(s, level=6, wbits=-15)
    bad = bytearray(blob)
    bad[starts[1]] |= 0x06          # BTYPE=11: invalid block type
    fb_before = IT.stats["fallback"]
    err_before = IT.stats["error"]
    with pytest.raises(DataError, match="invalid block type"):
        decompress_segments_multichip(bytes(bad), starts, mesh)
    assert IT.stats["fallback"] == fb_before
    assert IT.stats["error"] == err_before + 1
