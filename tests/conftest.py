"""Test configuration: force a virtual 8-device CPU mesh before jax imports.

Real-TPU kernels are exercised by bench.py / the driver; unit tests validate
algorithmic correctness (and multi-chip sharding) on the CPU backend.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# both vars: in this image JAX_PLATFORMS alone is overridden by the axon
# (TPU tunnel) plugin; JAX_PLATFORM_NAME wins
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
