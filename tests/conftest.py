"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests run
anywhere (the JAX analog of testing DDP without GPUs).

The container boots JAX with a remote-TPU platform pre-registered (a
sitecustomize calls jax.config.update('jax_platforms', ...)), so env vars are
not enough — we must update the jax config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8
