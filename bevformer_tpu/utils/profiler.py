"""Lightweight profiling utilities.

`run_time` mirrors the reference decorator (`models/utils/bricks.py:7-19`):
forces device sync around the call (on the axon relay, block_until_ready is
unreliable, so a host fetch of a scalar is used) and prints the running
mean per function. `trace` wraps jax.profiler for full XLA traces.
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

_TOTALS = defaultdict(float)
_COUNTS = defaultdict(int)


def _sync(x):
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "block_until_ready")]
    if leaves:
        # host fetch of one element forces completion even on relay backends
        jnp.asarray(leaves[-1]).ravel()[0].item()
    return x


def run_time(name: str):
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            t0 = time.time()
            out = _sync(fn(*args, **kwargs))
            dt = time.time() - t0
            _TOTALS[name] += dt
            _COUNTS[name] += 1
            print(
                f"{name}: {dt*1e3:.2f} ms "
                f"(mean {1e3*_TOTALS[name]/_COUNTS[name]:.2f} over "
                f"{_COUNTS[name]})"
            )
            return out

        return wrapper

    return deco


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
