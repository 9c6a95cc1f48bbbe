"""Shared helpers for the BASELINE.json benchmark configs.

Timing methodology: the axon TPU tunnel adds ~25 ms per dispatch and its
block_until_ready is unreliable, so steps are chained on device — either via
lax.scan inside one jitted program (pure compute) or via a data-dependent
carry across dispatches — and synced once by pulling a scalar to the host.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def enable_compile_cache() -> None:
    path = os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def perturb_variables(variables, carry):
    """Make a variables pytree data-dependent on a scan carry — nudge ONE
    1-D leaf (a bias) by carry*1e-20. Without this, a scanned step body that
    doesn't consume the carry is loop-invariant and XLA hoists it: the scan
    times ONE iteration (an early probe reported an impossible 86k img/s
    exactly this way — benchmarks/exp_smallbatch.py docstring). The (32,)
    add costs nothing, unlike an `images + carry` which pays a full
    image-tensor read+write per step.
    """
    done = [False]

    def nudge(x):
        if x.ndim == 1 and not done[0]:
            done[0] = True
            return x + jnp.asarray(carry * 1e-20, x.dtype)
        return x

    return jax.tree_util.tree_map(nudge, variables)


def time_scan_chained(
    step_to_scalar: Callable, *args, iters: int = 10, reps: int = 3
) -> float:
    """Time `step_to_scalar(*args, carry)->scalar` chained `iters` times inside
    one jitted scan; min over `reps` timed runs (CLAUDE.md: ~5% run-to-run
    tunnel/host spread — a single sample is indistinguishable from a real
    regression). Returns seconds per step."""

    @jax.jit
    def many(*a):
        def body(c, _):
            return step_to_scalar(*a, c), None

        out, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    float(many(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def time_dispatch_chained(
    step: Callable, *args, iters: int = 10, reps: int = 3
) -> float:
    """Time `step(*args, carry)->scalar` chained by its carry across separate
    dispatches (for programs too expensive to compile inside a scan); min of
    `reps` runs. Returns seconds per step."""
    carry = jnp.float32(0.0)
    carry = step(*args, carry)
    float(carry)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        carry = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step(*args, carry)
        float(carry)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def emit(metric: str, value: float, unit: str, baseline: float | None = None, **extra):
    # 4 decimals, NOT 2: recall metrics live on a 'within 1% of the
    # reference' claim — 2-decimal rounding would publish at exactly the
    # claim's granularity and hide 0.8pp regressions
    rec = {"metric": metric, "value": round(value, 4), "unit": unit}
    if baseline:
        rec["vs_baseline"] = round(value / baseline, 3)
    rec.update(extra)
    print(json.dumps(rec))
