"""Wall-clock timing helpers.

Replacement for the reference's clock()-based timer (src/timer.c:3-11) and
the global `bfToc()` (include/bf/util.h:10). Adds a `device_time` helper that
blocks on JAX async dispatch so device work is actually measured.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax

_TOC_T0 = time.perf_counter()


def toc() -> float:
    """Seconds since the last call to `toc` (reference: bfToc, src/util.c)."""
    global _TOC_T0
    now = time.perf_counter()
    elapsed = now - _TOC_T0
    _TOC_T0 = now
    return elapsed


class Timer:
    """Resettable stopwatch (reference: BfTimer, src/timer.c)."""

    def __init__(self) -> None:
        self._t0 = time.perf_counter()

    def reset(self) -> None:
        self._t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0


def device_time(fn: Callable[[], Any], *, warmup: int = 1, iters: int = 10) -> float:
    """Median wall time per call of `fn`, blocking on device completion.

    `fn` should return a JAX array (or pytree); we block_until_ready on it so
    async dispatch doesn't fake the measurement.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
