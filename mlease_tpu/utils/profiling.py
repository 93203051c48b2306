"""Profiling / tracing hooks.

The reference's only observability is Hadoop progress reporting + log4j lines
(SURVEY.md section 5 "tracing/profiling: none"); here the native equivalents:
`trace(dir)` wraps a region in a jax profiler trace viewable in
TensorBoard/XProf, and `timed` collects named wall-clock spans. The ADMM
driver additionally records per-iteration wall times in AdmmResult.iter_times
and logs them per iteration (the analogue of the reference's convergence log
lines, RegressionAdmmTrain.java:465-466).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace of the enclosed region (no-op when log_dir falsy)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


class Timings:
    """Named wall-clock span collector."""

    def __init__(self):
        self.spans: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            self.spans[name].append(time.monotonic() - t0)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, times in self.spans.items():
            out[name] = {"count": len(times), "total_s": sum(times),
                         "mean_s": sum(times) / len(times)}
        return out
