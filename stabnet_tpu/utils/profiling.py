"""First-class timing / profiling instrumentation.

The reference's instrumentation is scattered wall-clock prints (data-read vs.
train time every 100 iters, deploy fps every 10 frames; reference:
train_bundle_nobm.py:237-242,323-348, deploy_bundle.py:285-287,316-318).  Here
the same signals are a small metrics module, plus a hook into `jax.profiler`
for real device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional

import numpy as np


class Timer:
    """Accumulating wall-clock timer."""

    def __init__(self) -> None:
        self.total = 0.0
        self.count = 0
        self._start: Optional[float] = None

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self) -> float:
        assert self._start is not None, "Timer.stop() without start()"
        dt = time.perf_counter() - self._start
        self.total += dt
        self.count += 1
        self._start = None
        return dt

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)

    def reset(self) -> None:
        self.total = 0.0
        self.count = 0


class StageTimer:
    """Named per-stage timers with percentile summaries.

    Used by the train loop ("data" vs. "step") and the streaming driver's
    per-frame latency decomposition ("pre"/"dispatch"/"readback",
    StreamDriver.stabilize_clip), replacing the reference's ad-hoc prints.
    """

    def __init__(self) -> None:
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "count": int(a.size),
                "total_s": float(a.sum()),
                "mean_ms": float(a.mean() * 1e3),
                "p50_ms": float(np.percentile(a, 50) * 1e3),
                "p95_ms": float(np.percentile(a, 95) * 1e3),
            }
        return out

    def reset(self) -> None:
        self.samples.clear()


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace around a code region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
