"""Observability: profiling hooks, step timers, NaN scrubbing, signals.

Upgrades the reference's ad-hoc affordances (reference: SIGUSR1 stack dump at
trainer/__init__.py:27-45, NaN-grad scrubber :126-131, time.time() prints,
model-size printers util/misc.py:60-136) into first-class utilities:
  * jax.profiler trace context + per-phase timers;
  * a jit-safe NaN/Inf gradient scrubber (nan_to_num over the grad pytree);
  * SIGUSR1 -> dump all thread stacks, SIGUSR2 -> graceful exit;
  * parameter-count reporting per branch.
"""
from __future__ import annotations

import contextlib
import faulthandler
import signal
import sys
import time
from collections import defaultdict
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Profiling
# ---------------------------------------------------------------------------

@contextlib.contextmanager
def profile_trace(log_dir, enabled: bool = True):
    """XLA/TPU profiler trace (view with TensorBoard or xprof)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating wall-clock timers per named phase."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {name: {"total_s": self.totals[name], "count": self.counts[name],
                       "mean_ms": 1000 * self.totals[name] / max(self.counts[name], 1)}
                for name in self.totals}


# ---------------------------------------------------------------------------
# Numerical safety
# ---------------------------------------------------------------------------

def scrub_nan_grads(grads):
    """Replace NaN/Inf gradients with zeros (jit-safe).

    The reference defines (but never wires) the same scrubber
    (trainer/__init__.py:126-131); here it can be composed into the optimizer
    chain or applied in the train step.
    """
    return jax.tree.map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0), grads)


def finite_check(tree, name: str = "tree") -> bool:
    """Host-side: True iff every leaf is finite (for debugging/asserts)."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            print(f"[finite_check] non-finite values in {name}{path}",
                  file=sys.stderr)
            return False
    return True


# ---------------------------------------------------------------------------
# Signals (cluster debugging)
# ---------------------------------------------------------------------------

def install_signal_handlers():
    """SIGUSR1 -> dump all stacks to stderr; SIGUSR2 -> exit(1).

    Reference: trainer/__init__.py:27-45.
    """
    def dump_stacks(_sig, _frame):
        faulthandler.dump_traceback(file=sys.stderr)

    def quit_now(_sig, _frame):
        print("received SIGUSR2 — exiting", file=sys.stderr)
        sys.exit(1)

    signal.signal(signal.SIGUSR1, dump_stacks)
    signal.signal(signal.SIGUSR2, quit_now)


# ---------------------------------------------------------------------------
# Model reporting
# ---------------------------------------------------------------------------

def parameter_counts(params: dict) -> Dict[str, int]:
    """Per-branch parameter counts (reference: util/misc.py:60-136)."""
    counts = {}
    for name, branch in params.items():
        counts[name] = int(sum(np.prod(np.shape(leaf))
                               for leaf in jax.tree.leaves(branch)))
    counts["total"] = sum(counts.values())
    return counts


def print_model_summary(params: dict) -> None:
    counts = parameter_counts(params)
    width = max(len(k) for k in counts)
    for name, count in sorted(counts.items(), key=lambda kv: -kv[1]):
        print(f"  {name:<{width}}  {count:>12,}")
