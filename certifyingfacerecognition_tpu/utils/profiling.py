"""Tracing and phase-timing subsystem.

The reference's observability is wall-clock prints scattered through the
scripts (certify.py:129-156, gen_utils.py:639,700, autoattack.py:130) —
SURVEY.md §5. Here it is a real subsystem:

  * ``trace(logdir)`` — context manager around jax.profiler for device
    traces viewable in TensorBoard/Perfetto;
  * ``annotate(name)`` — TraceAnnotation so named phases show up inside
    device traces;
  * ``PhaseTimer`` — accumulating named wall-clock phases with a report,
    replacing the ad-hoc prints (works under jit dispatch by optionally
    synchronising on a result);
  * ``device_sync(x)`` — a *real* barrier: under some remote-execution
    transports (axon) ``block_until_ready`` returns before execution
    finishes, so synchronisation pulls one element to the host.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import numpy as np


def device_sync(x=None) -> None:
    """Barrier on device work. Pulls one scalar to the host, which is the
    only reliable sync under remote-execution transports."""
    if x is None:
        return
    leaf = jax.tree.leaves(x)
    if leaf:
        np.asarray(jax.device_get(leaf[0].ravel()[0] if leaf[0].ndim else
                                  leaf[0]))


def sync_overhead(reps: int = 5) -> float:
    """Measured seconds of pure dispatch + host-pull overhead: a tiny
    jitted op followed by device_sync. Through the axon tunnel this is
    ~30 ms (round-2 measurement) — any standalone op timing that does not
    subtract or amortise it is wrong by up to that much."""
    import jax.numpy as jnp

    e = jax.jit(lambda x: x * 1.0)
    s = e(jnp.zeros((8, 128)))
    device_sync(s)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s = e(s)
        device_sync(s)
        best = min(best, time.perf_counter() - t0)
    return best


def measure(fn, *args, reps: int = 5, subtract_sync: bool = True) -> float:
    """Best-of-``reps`` wall-clock seconds of ``fn(*args)`` with a real
    device barrier, minus the measured sync floor (see sync_overhead).
    ``fn`` should already be jitted; the first (compile) call is excluded.
    Negative results are clamped to 0 (op faster than sync jitter)."""
    out = fn(*args)
    device_sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        device_sync(out)
        best = min(best, time.perf_counter() - t0)
    if subtract_sync:
        best = max(0.0, best - sync_overhead())
    return best


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace under ``logdir`` (jax.profiler)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a device trace."""
    return jax.profiler.TraceAnnotation(name)


class _PhaseHandle:
    """Collects the value to synchronise on from INSIDE the timed block —
    a ``sync=`` keyword would be evaluated before the block runs and could
    only ever point at a previous iteration's (already materialised)
    result."""

    def __init__(self):
        self.value = None

    def sync(self, x):
        self.value = x
        return x


class PhaseTimer:
    """Accumulating wall-clock phase timers.

    Usage::

        timer = PhaseTimer()
        with timer.phase("synthesis") as ph:
            img = ph.sync(synth(w))     # barrier on THIS block's result
        logger.info(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        handle = _PhaseHandle()
        t0 = time.perf_counter()
        try:
            yield handle
        finally:
            device_sync(handle.value)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = ["phase timings:"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"  {name:24s} {t:8.3f}s ({c}x, "
                         f"{t / c * 1e3:7.1f} ms/call, {100 * t / total:4.1f}%)")
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
