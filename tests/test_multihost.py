"""Multi-host sharded compression over a real jax.distributed cluster.

Two processes × 4 virtual CPU devices = one 8-device global mesh (the
CPU-fake analog of a 2-host TPU slice, SURVEY §4 "multi-node testing").
The sharded step runs SPMD across both processes; host 0 assembles the
stream, which must decode bit-exactly with the zlib oracle.
"""
import os
import socket
import subprocess
import sys
import zlib

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster_compress(tmp_path):
    rng = np.random.default_rng(42)
    # compressible mix across many lanes
    data = (b"multi host lane payload " * 800
            + bytes(rng.integers(0, 256, 8192, dtype=np.uint8))
            + bytes(8192)) * 2
    in_path = str(tmp_path / "in.bin")
    out_path = str(tmp_path / "out.zz")
    open(in_path, "wb").write(data)

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "mh_worker.py"),
         str(pid), "2", str(port), in_path, out_path],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    blob = open(out_path, "rb").read()
    assert zlib.decompress(blob) == data
    assert len(blob) < len(data)
    # the multi-host path runs the REAL dynamic pipeline: ratio must track
    # the single-process zlib oracle (small per-16K-tree overhead allowed),
    # unlike the old static-trees-only demo lane (round-2 weak #7)
    assert len(blob) <= int(len(zlib.compress(data, 6)) * 1.10), \
        (len(blob), len(zlib.compress(data, 6)))
    # first block must be dynamic (btype=2) on this compressible corpus
    assert ((blob[2] >> 1) & 3) == 2, "expected a dynamic first block"
    # sharded multi-host decode output (written by the workers)
    dec = open(out_path + ".dec", "rb").read()
    assert dec == data


def test_singleprocess_global_path():
    """Same multihost code path (global-array placement + gather seam) in a
    single process (guards the placement/fetch logic without subprocess
    overhead)."""
    from zlibng_tpu.parallel.multihost import (
        multihost_compress, multihost_decompress_segments,
    )
    from zlibng_tpu.stream.deflate import compress as compress_host

    data = (b"abcabcabc" * 3000) + bytes(range(256)) * 8
    blob = multihost_compress(data, lane_block=8192)
    assert blob is not None
    assert zlib.decompress(blob) == data

    segs = [data[i:i + 8192] for i in range(0, len(data), 8192)]
    raw = b""
    starts = []
    for s in segs:
        starts.append(len(raw))
        raw += compress_host(s, level=6, wbits=-15)
    outs = multihost_decompress_segments(raw, starts)
    assert b"".join(outs) == data
