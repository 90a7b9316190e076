"""Profiling hooks: per-frame wall-clock + device tracing.

Equivalent of the reference's chrono timers around ProcessFrame
(demo-davison-mono-slam.cpp:1736-1741, "track=..ms | ..fps" VLOG) plus the
TPU-native upgrade: jax.profiler traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class FrameTimer:
    """Streaming frame-duration stats (the 'track=..ms | ..fps' line)."""

    durations: list = field(default_factory=list)
    _t0: float = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.durations.append(time.perf_counter() - self._t0)
        return False

    @property
    def last_ms(self) -> float:
        return self.durations[-1] * 1e3 if self.durations else 0.0

    @property
    def avg_ms(self) -> float:
        return (sum(self.durations) / len(self.durations) * 1e3
                if self.durations else 0.0)

    @property
    def fps(self) -> float:
        return 1e3 / self.last_ms if self.last_ms > 0 else 0.0

    def format_line(self) -> str:
        return f"track={self.last_ms:.1f}ms | {self.fps:.1f}fps"


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace of everything inside the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in device traces (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield
