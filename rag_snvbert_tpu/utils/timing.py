"""Tracing & profiling utilities.

The reference's entire observability layer is a wall-clock ``timer``
decorator (src/dataset/utils.py:23-36) and ad-hoc time.time() deltas; the
TPU-native replacement adds:
  - ``timer``: the same decorator (kept for parity), logging instead of
    printing;
  - ``Phase``: nestable named phase timers with a summary table;
  - ``profile_trace``: a context manager around jax.profiler for real XLA
    traces viewable in TensorBoard/Perfetto;
  - ``annotate``: jax.profiler.TraceAnnotation passthrough for marking
    host-side phases inside a device trace.
"""

from __future__ import annotations

import collections
import contextlib
import functools
import logging
import time

log = logging.getLogger("rag_snvbert_tpu")


def timer(fn):
    """Wall-clock decorator (reference parity: utils.py:23-36)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.time()
        out = fn(*args, **kwargs)
        log.info("%s took %.3fs", getattr(fn, "__qualname__", fn.__name__),
                 time.time() - t0)
        return out

    return wrapper


class Phase:
    """Accumulating named phase timers.

    >>> phases = Phase()
    >>> with phases("retrieval"): ...
    >>> with phases("forward"): ...
    >>> phases.summary()  # {'retrieval': {'total_s': ..., 'count': ...}, ...}
    """

    def __init__(self):
        self.totals: dict[str, float] = collections.defaultdict(float)
        self.counts: dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, dict]:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_ms": round(1e3 * v / max(self.counts[k], 1), 3)}
                for k, v in self.totals.items()}

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture an XLA device trace (jax.profiler) for TensorBoard."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a device trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)
