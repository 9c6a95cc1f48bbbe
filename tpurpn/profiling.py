"""Tracing/profiling subsystem (SURVEY.md §5 — absent in the reference).

Two tools:
* :func:`trace` — context manager around ``jax.profiler.trace`` writing a
  perfetto/tensorboard-loadable trace directory;
* :class:`StepTimer` — a dispatch-safe step timing harness for the
  images/sec/chip metric: chains steps through device-side data dependencies
  and syncs once, so tunnel/dispatch latency doesn't pollute the number (the
  methodology every benchmarks/config* script uses).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpurpn_trace"):
    """Capture a device trace: view in perfetto or TensorBoard's profile tab."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Times chained device steps; reports seconds/step without host syncs.

    step_fn must take and return a carry (scalar or pytree whose first leaf
    is pulled to host at the end for the sync).
    """

    def __init__(self, step_fn: Callable, init_carry):
        self.step_fn = step_fn
        self.init_carry = init_carry

    def run(self, iters: int = 10, warmup: int = 1) -> float:
        carry = self.init_carry
        for _ in range(warmup):
            carry = self.step_fn(carry)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), carry)
        float(jax.tree_util.tree_leaves(carry)[0].sum())  # hard sync
        carry = self.init_carry
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = self.step_fn(carry)
        float(jax.tree_util.tree_leaves(carry)[0].sum())
        return (time.perf_counter() - t0) / iters
