"""Tracing / profiling utilities.

The reference has no dedicated tracing (SURVEY.md §5 — closest are the
optimizer progress frames and ``total_time_optimization_seconds``).  This
module goes further: wall-clock scopes, per-run solver statistics, and a
hook into JAX's profiler for on-device traces.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from collections import defaultdict
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class Tracer:
    """Nested wall-clock scopes with aggregated statistics.

    >>> tracer = Tracer()
    >>> with tracer.scope("forward"):
    ...     ...
    >>> tracer.summary()
    """

    def __init__(self):
        self.records = defaultdict(list)
        self._stack = []

    @contextlib.contextmanager
    def scope(self, name: str):
        full = "/".join([*self._stack, name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._stack.pop()
            self.records[full].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, times in sorted(self.records.items()):
            out[name] = {
                "count": len(times),
                "total_s": sum(times),
                "mean_s": sum(times) / len(times),
                "max_s": max(times),
            }
        return out

    def log_summary(self):
        for name, s in self.summary().items():
            logger.info(
                "%-40s n=%-4d total=%.3fs mean=%.4fs", name, s["count"],
                s["total_s"], s["mean_s"],
            )

    def save(self, path):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=1)
        return path


@contextlib.contextmanager
def device_trace(log_dir: str):
    """On-device trace via jax.profiler (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def run_stats(sim) -> Optional[Dict]:
    """Solver statistics of the last ``Simulation.run`` (Newton iteration
    counts per step; the analogue of SNES iteration reports)."""
    info = getattr(sim, "solver_info", None)
    if not info:
        return None
    iters = info["newton_iters"]
    return {
        "steps": int(len(iters)),
        "newton_iters_per_step": [int(k) for k in iters],
        "newton_iters_total": int(iters.sum()),
    }
