"""Fetch-forced benchmarking utilities.

On some remote-attached TPU runtimes, ``jax.block_until_ready`` is not a
reliable completion barrier (observed: it can return before device work
finishes), and every host<->device synchronization costs a round trip
(~tens of ms).  Robust timing therefore:

  1. forces completion with a *scalar value fetch* that depends on the
     computation chain (device executes in order, so fetching a scalar
     reduction of the last output waits for everything before it);
  2. measures at two iteration counts and reports the slope, which cancels
     the fixed per-sync round-trip cost.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def fetch_scalar(tree) -> float:
    """Force completion: fetch a scalar that depends on one output leaf."""
    leaf = None
    for x in jax.tree.leaves(tree):
        if hasattr(x, "dtype"):
            leaf = x
            break
    if leaf is None:
        return 0.0
    return float(jnp.asarray(leaf).ravel()[0])


def steady_state_ms(fn: Callable, *args, iters_lo: int = 2,
                    iters_hi: int = 10, warmup: int = 1) -> dict:
    """Per-iteration wall time via the two-point slope method.

    ``fn(*args)`` must return a jax pytree.  Returns a dict with the slope
    estimate (per-iter ms, sync overhead cancelled) and both raw points.
    """
    for _ in range(warmup):
        fetch_scalar(fn(*args))

    def run(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn(*args)
        fetch_scalar(r)
        return time.perf_counter() - t0

    t_lo = run(iters_lo)
    t_hi = run(iters_hi)
    slope = (t_hi - t_lo) / (iters_hi - iters_lo)
    return {
        "per_iter_ms": slope * 1e3,
        "raw_lo_ms": t_lo / iters_lo * 1e3,
        "raw_hi_ms": t_hi / iters_hi * 1e3,
        "iters": (iters_lo, iters_hi),
    }


def chained_state_ms(step: Callable, state, *args, iters_lo: int = 2,
                     iters_hi: int = 8) -> dict:
    """Like steady_state_ms for stateful steps ``state, aux = step(state,
    *args)`` where each call consumes the previous state (donation-safe)."""
    state, aux = step(state, *args)
    fetch_scalar(aux)

    def run(n, st):
        t0 = time.perf_counter()
        aux = None
        for _ in range(n):
            st, aux = step(st, *args)
        fetch_scalar(aux)
        return time.perf_counter() - t0, st

    t_lo, state = run(iters_lo, state)
    t_hi, state = run(iters_hi, state)
    slope = (t_hi - t_lo) / (iters_hi - iters_lo)
    return {
        "per_iter_ms": slope * 1e3,
        "raw_lo_ms": t_lo / iters_lo * 1e3,
        "raw_hi_ms": t_hi / iters_hi * 1e3,
        "state": state,
    }
