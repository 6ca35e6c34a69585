"""Worker process for tests/test_multihost.py: one simulated host with
4 virtual CPU devices, joined into a 2-process jax.distributed cluster."""
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

from zlibng_tpu.parallel.multihost import multihost_compress  # noqa: E402

data = open(in_path, "rb").read()
out = multihost_compress(data)
if pid == 0:
    assert out is not None
    with open(out_path, "wb") as f:
        f.write(out)
else:
    assert out is None
print(f"worker {pid} done", flush=True)
