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


def test_singleprocess_global_path():
    """Same multihost code path on an in-process 8-device mesh (guards the
    assembly + combine logic without subprocess overhead)."""
    import jax
    from jax.sharding import Mesh

    from zlibng_tpu.parallel.multihost import (
        assemble_zlib_stream, compress_global,
    )

    data = (b"abcabcabc" * 3000) + bytes(range(256)) * 8
    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    packed, totals, shard_adlers, payload_lens, shard_payload_lens = \
        compress_global(data, mesh)
    blob = assemble_zlib_stream(packed, totals, payload_lens,
                                shard_adlers, shard_payload_lens)
    assert zlib.decompress(blob) == data
