"""Tracing / profiling utilities.

The reference has only ad-hoc perf_counter prints (reference:
envs/ig_env.py:503-504, learning/base_agent.py:424-427, per-step
compute_time at envs/ig_parkour/ig_parkour_env.py:1543-1547).  The
TPU-native equivalent (SURVEY §5) is first-class:

* ``PhaseTimer`` — named per-phase wall timers with device
  synchronization.  ``block_until_ready`` is unreliable on the remote
  axon backend (CLAUDE.md), so synchronization fetches a scalar from a
  caller-provided array instead when one is given.
* ``trace`` — context manager around ``jax.profiler`` producing an XLA
  trace viewable in TensorBoard / Perfetto.
* ``annotate`` — ``jax.profiler.TraceAnnotation`` wrapper so host-side
  phases show up inside device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Optional

import jax
import numpy as np


def sync(x=None) -> None:
    """Wait for device work.  Fetching a scalar is the only reliable
    barrier on the remote-TPU (axon) backend."""
    if x is None:
        return
    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(jax.device_get(jax.tree.leaves(leaves[0])[0])).ravel()


class PhaseTimer:
    """Accumulating named phase timers.

    >>> pt = PhaseTimer()
    >>> with pt.phase("rollout", sync_on=state.reward):
    ...     state = step(state)
    >>> pt.summary()   # {'rollout': {'total_s': ..., 'count': ..., ...}}
    """

    def __init__(self):
        self._acc = OrderedDict()

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            sync(sync_on)
            dt = time.perf_counter() - t0
            tot, cnt = self._acc.get(name, (0.0, 0))
            self._acc[name] = (tot + dt, cnt + 1)

    def summary(self) -> "OrderedDict[str, dict]":
        out = OrderedDict()
        for name, (tot, cnt) in self._acc.items():
            out[name] = {"total_s": tot, "count": cnt,
                         "mean_ms": 1e3 * tot / max(cnt, 1)}
        return out

    def report(self) -> str:
        rows = [f"  {k:<24s} {v['mean_ms']:9.3f} ms x{v['count']:<6d} "
                f"= {v['total_s']:8.3f} s"
                for k, v in self.summary().items()]
        return "\n".join(rows)

    def reset(self):
        self._acc.clear()


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    """XLA profiler trace; open with TensorBoard profile plugin or
    Perfetto.  Usage: ``with profiling.trace('/tmp/trace'): run()``."""
    jax.profiler.start_trace(log_dir, host_tracer_level=host_tracer_level)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a host-side region inside a device trace."""
    return jax.profiler.TraceAnnotation(name)
