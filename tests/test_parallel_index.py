"""Parallel-decode index + sharded compression (virtual 8-device mesh)."""
import zlib

import numpy as np
import pytest

from zlibng_tpu.parallel.index import (
    StreamIndex, build_index_by_scan, compress_indexed, decompress_indexed,
    find_sync_candidates,
)

rng = np.random.default_rng(21)
DATA = (b"indexed parallel segments with repeated content " * 8000)  # ~384KB


def test_compress_indexed_roundtrip():
    blob, idx = compress_indexed(DATA, level=6, segment=100_000)
    # whole stream is ordinary raw deflate
    assert zlib.decompress(blob, -15) == DATA
    assert len(idx.comp_offsets) == len(idx.out_offsets)
    assert decompress_indexed(blob, idx) == DATA


def test_segments_independent():
    blob, idx = compress_indexed(DATA, level=6, segment=100_000)
    # each non-first segment decodes standalone (history was reset)
    c0, c1 = idx.comp_offsets[1], idx.comp_offsets[2]
    o0, o1 = idx.out_offsets[1], idx.out_offsets[2]
    d = zlib.decompressobj(-15)
    got = d.decompress(blob[c0:c1])
    assert got[: o1 - o0] == DATA[o0:o1]


def test_index_json_roundtrip():
    blob, idx = compress_indexed(DATA, segment=100_000)
    idx2 = StreamIndex.from_json(idx.to_json())
    assert decompress_indexed(blob, idx2) == DATA


def test_scan_rebuild_index():
    blob, idx = compress_indexed(DATA, level=6, segment=100_000)
    rebuilt = build_index_by_scan(blob)
    assert rebuilt.total_out == len(DATA)
    assert decompress_indexed(blob, rebuilt) == DATA


def test_sync_candidates_found():
    blob, idx = compress_indexed(DATA, segment=100_000)
    cands = find_sync_candidates(blob)
    # one marker per non-final segment
    assert len(cands) >= len(idx.comp_offsets) - 2


def test_dryrun_multichip_8():
    """The driver's multi-chip dryrun on the virtual CPU mesh."""
    import sys
    sys.path.insert(0, "/root/repo")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util
    import jax
    spec = importlib.util.spec_from_file_location(
        "graft_entry2", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
