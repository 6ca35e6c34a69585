"""Worker process for tests/test_multihost.py: one simulated host with
4 virtual CPU devices, joined into a 2-process jax.distributed cluster.

Drives BOTH multi-host directions of the real dynamic pipeline:
  1. multihost_compress — dynamic-Huffman sharded compression
  2. multihost_decompress_segments — sharded phase A/B decode of indexed
     full-flush segments (every process must get identical output)
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
in_path, out_path = sys.argv[4], sys.argv[5]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)

from zlibng_tpu.parallel.multihost import (  # noqa: E402
    multihost_compress, multihost_decompress_segments,
)
from zlibng_tpu.stream.deflate import compress as compress_host  # noqa: E402

data = open(in_path, "rb").read()

# 1) compress: the dynamic-tree pipeline over the 2-process global mesh
out = multihost_compress(data, lane_block=16384)
if pid == 0:
    assert out is not None
    with open(out_path, "wb") as f:
        f.write(out)
else:
    assert out is None

# 2) decode: shard independently-compressed full-flush segments across the
# same global mesh; every process receives the full output
segs = [data[i:i + 16384] for i in range(0, len(data), 16384)]
blob = b""
starts = []
for s in segs:
    starts.append(len(blob))
    blob += compress_host(s, level=6, wbits=-15)
from zlibng_tpu.ops import inflate_tpu as IT  # noqa: E402

mesh_before = IT.stats["mesh_ok"]
outs = multihost_decompress_segments(blob, starts)
assert b"".join(outs) == data, "multi-host sharded decode mismatch"
assert IT.stats["mesh_ok"] == mesh_before + 1, "mesh decode fell back"
if pid == 0:
    with open(out_path + ".dec", "wb") as f:
        f.write(b"".join(outs))

print(f"worker {pid} done", flush=True)
