"""Profiling and tracing hooks.

The aux-subsystem analog of the reference's observability tooling
(reference: Lightning `profiler='simple'` in ae_s2/train.py:307; scalene
CPU/IO profiles checked into pipeline/datasets/sevir/profiles/). On TPU the
equivalents are:
  * `trace(...)` — jax.profiler traces viewable in TensorBoard/Perfetto
    (tensorboard_plugin_profile is available in this image)
  * `StepTimer` — per-phase wall-time accounting with a 'simple'-profiler
    style summary report
  * `device_memory_stats()` — live HBM usage per device
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, host_profiling: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False,
                             create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-phase wall times; report() prints a summary table."""

    def __init__(self):
        self._sums: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._sums[name] += time.perf_counter() - t0
            self._counts[name] += 1

    def report(self) -> str:
        total = sum(self._sums.values()) or 1e-9
        lines = [f"{'phase':<24}{'calls':>8}{'total_s':>10}{'mean_ms':>10}{'%':>7}"]
        for name, s in sorted(self._sums.items(), key=lambda kv: -kv[1]):
            n = self._counts[name]
            lines.append(f"{name:<24}{n:>8}{s:>10.2f}{1000 * s / n:>10.1f}"
                         f"{100 * s / total:>6.1f}%")
        return "\n".join(lines)

    def reset(self) -> None:
        self._sums.clear()
        self._counts.clear()


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Live memory stats (bytes) for one device; {} if unsupported."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
