"""Tracing / profiling utilities (SURVEY.md §5.1 rebuild target).

The reference's only observability is tqdm progress bars around its python
loops (virial.py:48-53, data_structures.py:332-337).  With every hot loop
now a single XLA program, the analogues are:

* :func:`stage` — wall-clock stage timers that force completion of the
  returned arrays (honest timing despite async dispatch);
* :func:`trace` — a context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible trace directory;
* :func:`device_memory_stats` — allocator statistics per device (the
  analogue of YTHDF5.survey_memory, data_structures.py:266-296).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax

from .logging import mylog

__all__ = ["stage", "StageTimes", "trace", "device_memory_stats"]


@dataclass
class StageTimes:
    """Accumulated per-stage wall times (seconds)."""

    times: dict = field(default_factory=dict)

    def add(self, name: str, dt: float):
        self.times[name] = self.times.get(name, 0.0) + dt

    def report(self):
        for name, dt in sorted(self.times.items(), key=lambda kv: -kv[1]):
            mylog.info("stage %-30s %8.3f s", name, dt)
        return dict(self.times)


@contextlib.contextmanager
def stage(name: str, result_holder=None, accumulate: StageTimes | None = None,
          log: bool = True):
    """Time a pipeline stage, forcing completion of device work.

    Usage::

        holder = []
        with stage("eddington", holder):
            holder.append(compute_df(ee, pden))

    Anything appended to ``result_holder`` is block_until_ready'd before the
    timer stops, so asynchronous dispatch can't hide the cost.
    """
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if result_holder:
            for r in result_holder:
                jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        if accumulate is not None:
            accumulate.add(name, dt)
        if log:
            mylog.info("stage %s: %.3f s", name, dt)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        mylog.info("profiler trace written to %s", logdir)


def device_memory_stats():
    """Per-device allocator stats (bytes), where the backend reports them."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats
