"""Test configuration: force a virtual 8-device CPU mesh.

This image's sitecustomize imports jax (axon TPU plugin) at interpreter
startup, so env vars set here are too late — but backends initialize
lazily, so jax.config.update still wins as long as no device has been
touched. XLA_FLAGS is read when the CPU client is created.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
# backend-specific compilation cache (TPU-host AOT artifacts don't load
# cleanly into CPU-backend processes)
os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.expanduser(
    "~/.cache/zlibng_tpu_xla_cpu")

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
