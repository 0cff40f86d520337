"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-chip sharding logic (halo exchange, data parallelism) is validated on
fake CPU devices via --xla_force_host_platform_device_count, per the JAX
multi-host testing recipe; the real-TPU path is exercised by bench.py.

NOTE: in this environment a sitecustomize hook force-registers the TPU
backend and overrides the JAX_PLATFORMS env var, so we must switch the
platform via jax.config *after* import — env vars alone are ignored.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
