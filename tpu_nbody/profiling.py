"""Tracing / profiling helpers (SURVEY §5.1 aux subsystem).

The reference's only performance instrumentation is a wall-clock FPS counter
(``NBodyPanel.kt:361-368``, ``gpu/GPU.kt:721-726``). Here:

* :class:`PhaseTimer` — named host-side phase timing with true device sync
  (a host value pull: on this backend ``block_until_ready`` can return
  before work completes, see PERFORMANCE.md).
* :class:`Meter` — the FPS counter generalized to body-updates/sec.
* :func:`trace` — context manager around ``jax.profiler`` traces when the
  backend supports collection (silently a no-op otherwise).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def sync(x) -> None:
    """Force completion of device work feeding ``x`` (host value pull)."""
    arr = jax.tree.leaves(x)[0]
    np.asarray(jnp.ravel(arr)[0])


class PhaseTimer:
    """Accumulates wall time per named phase, with device sync at exits.

    >>> pt = PhaseTimer()
    >>> with pt("force"):
    ...     acc = accel(...)   # sync'd on exit
    >>> pt.report()
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, result=None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            out = holder.get("result", result)
            if out is not None:
                sync(out)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {tot * 1e3:.1f} ms total, "
                         f"{tot / n * 1e3:.2f} ms/call x{n}")
        return "\n".join(lines)


class Meter:
    """Throughput meter: updates/sec over a sliding 1 s window (HUD FPS)."""

    def __init__(self):
        self._count = 0
        self._t0 = time.time()
        self.rate = 0.0

    def tick(self, units: int = 1) -> float:
        self._count += units
        now = time.time()
        if now - self._t0 >= 1.0:
            self.rate = self._count / (now - self._t0)
            self._count = 0
            self._t0 = now
        return self.rate


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace if collectable on this backend, else no-op."""
    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:  # pragma: no cover - backend without profiling
        yield
