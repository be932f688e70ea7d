"""Platform selection helper for scripts/tools.

The container's sitecustomize pre-registers a remote-TPU platform ("axon")
that OVERRIDES the ``JAX_PLATFORMS`` environment variable (CLAUDE.md) — a
``JAX_PLATFORMS=cpu python tools/...`` run would still initialize the remote
backend, and when the tunnel is down that blocks the first jax op of the
process for minutes. Tools call :func:`honor_platform_env` before their
first jax op so the env var behaves as documented (same contract as
``bench.py``; tests instead set ``jax.config`` in ``tests/conftest.py``).
"""
from __future__ import annotations

import os


def honor_platform_env() -> None:
    """Re-apply ``JAX_PLATFORMS`` over the sitecustomize-registered default."""
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
