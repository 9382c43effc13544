"""Tracing / profiling hooks (aux subsystem; reference has only tqdm bars —
SURVEY.md §5).

* ``trace(logdir)`` — context manager around jax.profiler for device traces
  viewable in TensorBoard/Perfetto.
* ``StepTimer`` — lightweight steady-state step timing with clips/sec and
  a one-line summary, used by bench.py and available to the trainer.
* ``annotate`` — TraceAnnotation wrapper so epochs/stages show up as named
  spans in device traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(logdir: str | None):
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@dataclass
class StepTimer:
    clips_per_step: int = 0
    warmup: int = 3
    _times: list = field(default_factory=list)
    _steps: int = 0
    _t0: float = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        self._steps += 1
        if self._steps > self.warmup:
            self._times.append(time.perf_counter() - self._t0)

    @property
    def mean_step_seconds(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    @property
    def clips_per_sec(self) -> float:
        dt = self.mean_step_seconds
        return self.clips_per_step / dt if dt else 0.0

    def summary(self) -> str:
        return (
            f"{self.mean_step_seconds * 1e3:.3f} ms/step over {len(self._times)} steps"
            + (f", {self.clips_per_sec:.0f} clips/s" if self.clips_per_step else "")
        )
