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
    """Re-apply ``JAX_PLATFORMS`` over the sitecustomize-registered default.

    Also enables the repo-local persistent XLA compilation cache
    (``artifacts/xla_cache``, same store as ``bench.py``): on the remote-TPU
    platform every compile pays a ~60-200 s remote-compile HTTP hop, which
    dominates the wall clock of every tool that jits at production shapes
    (fidelity gates, stage profiler, e2e runs). Opt out with
    ``BENCH_NO_COMPILE_CACHE=1``.
    """
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # CPU-forced runs skip the cache: CPU compiles are seconds, and XLA:CPU
    # AOT cache loads emit noisy machine-feature-mismatch warnings
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    if not os.environ.get("BENCH_NO_COMPILE_CACHE"):
        import pathlib
        cache = pathlib.Path(__file__).resolve().parents[2] / "artifacts" / "xla_cache"
        try:
            cache.mkdir(parents=True, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", str(cache))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except (OSError, AttributeError):
            pass  # read-only checkout / older jax: compiles stay live
