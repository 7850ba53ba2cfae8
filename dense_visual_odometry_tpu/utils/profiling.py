"""Tracing / profiling hooks.

The reference's only observability is per-frame wall-clock deltas logged by
the benchmark CLI (``test_dvo.py:307-321``, SURVEY §5).  Here:

- :func:`trace_span` / :func:`annotate` wrap phases in ``jax.profiler``
  annotations so device timelines (XProf/TensorBoard) attribute kernel
  time to pipeline stages;
- :class:`WallClock` aggregates host-side phase timings with counts and
  percentiles for CLI summaries;
- :func:`start_trace` / :func:`stop_trace` capture a full device trace on
  demand (``--profile-dir`` in the benchmark CLI).

All hooks are no-ops in cost terms when unused — annotations are cheap
markers, and WallClock is a dict of floats.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace_span(name: str) -> Iterator[None]:
    """Annotate a host-side span so device ops dispatched inside it are
    grouped under ``name`` in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


def annotate(name: str):
    """Decorator form of :func:`trace_span`."""

    def deco(fn):
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        wrapped.__name__ = getattr(fn, "__name__", "annotated")
        return wrapped

    return deco


def start_trace(log_dir: str) -> None:
    """Begin capturing a device trace (XPlane / TensorBoard format)."""
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


class WallClock:
    """Host-side phase timing accumulator.

    >>> clock = WallClock()
    >>> with clock.span("track"):
    ...     pose = session.step(rgb, depth)
    >>> clock.summary()["track"]["mean_ms"]
    """

    def __init__(self) -> None:
        self._samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        self._samples[name].append(seconds)

    def summary(self, skip_first: bool = True) -> Dict[str, Dict[str, float]]:
        """Per-phase stats; ``skip_first`` drops the warm-up (compile)
        sample when more than one exists."""
        out = {}
        for name, xs in self._samples.items():
            steady = xs[1:] if (skip_first and len(xs) > 1) else xs
            steady_sorted = sorted(steady)
            n = len(steady_sorted)
            out[name] = {
                "count": float(len(xs)),
                "total_s": float(sum(xs)),
                "mean_ms": 1e3 * sum(steady) / n,
                "p50_ms": 1e3 * steady_sorted[n // 2],
                "p95_ms": 1e3 * steady_sorted[min(n - 1, int(0.95 * n))],
                "max_ms": 1e3 * steady_sorted[-1],
            }
        return out


def device_memory_stats() -> Optional[dict]:
    """Live HBM stats of device 0 ({bytes_in_use, bytes_limit, ...}) or
    None when the backend does not expose them (e.g. CPU)."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", None)
    if stats is None:
        return None
    try:
        return dev.memory_stats()
    except Exception:
        return None
