"""Tracing / profiling utilities (SURVEY §5 'Tracing': the reference has only
EMA FPS counters and wall-clock prints; this adds the TPU-native equivalents).

  * ``FPSMeter`` — EMA of 1/frame-time (reference viewer overlay parity,
    ``scripts/mesh_rt/app.py:194-200``)
  * ``Timer`` / ``timed`` — synced wall-clock sections (forces a scalar
    readback: ``block_until_ready`` can be a no-op on remote backends)
  * ``trace`` — context manager around ``jax.profiler`` for XLA-level traces
  * ``RenderStats`` — steps/ray + composite-work counters emitted by the
    marchers for Pareto-curve evaluation (docs/Methodology...:56-60)
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp


class FPSMeter:
    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.fps = 0.0
        self._last: Optional[float] = None

    def tick(self) -> float:
        now = time.perf_counter()
        if self._last is not None:
            dt = max(now - self._last, 1e-9)
            inst = 1.0 / dt
            self.fps = inst if self.fps == 0.0 else \
                (1 - self.alpha) * self.fps + self.alpha * inst
        self._last = now
        return self.fps


def sync(x) -> None:
    """Provably wait for device work: scalar readback of a reduction."""
    jnp.sum(x).item() if hasattr(x, "dtype") else jax.block_until_ready(x)


@dataclass
class Timer:
    name: str = "section"
    times: List[float] = field(default_factory=list)

    @contextlib.contextmanager
    def __call__(self, out=None):
        t0 = time.perf_counter()
        yield
        if out is not None:
            sync(out)
        self.times.append(time.perf_counter() - t0)

    @property
    def mean_ms(self) -> float:
        return 1000.0 * sum(self.times) / max(len(self.times), 1)

    def report(self) -> str:
        return f"{self.name}: {self.mean_ms:.2f} ms over {len(self.times)} runs"


@contextlib.contextmanager
def timed(name: str = "section", out=None):
    t0 = time.perf_counter()
    yield
    if out is not None:
        sync(out)
    print(f"[timed] {name}: {(time.perf_counter() - t0) * 1000:.2f} ms")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """XLA-level profiler trace (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class RenderStats:
    """Per-frame renderer work counters."""

    planes: int = 0
    rays: int = 0
    samples: int = 0

    @property
    def steps_per_ray(self) -> float:
        return self.samples / max(self.rays, 1)

    def to_dict(self) -> Dict[str, float]:
        return {"planes": self.planes, "rays": self.rays,
                "samples": self.samples, "steps_per_ray": self.steps_per_ray}
