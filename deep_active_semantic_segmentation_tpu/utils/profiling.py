"""Throughput counters + optional device profiler traces.

The reference's only timing apparatus is commented-out wall-clock probes
around the scoring loops (SURVEY.md section 5.1 — mc_dropout.py:136-156 et
al.); here throughput is a first-class utility:

* ``Throughput`` — images/sec (and per-chip) counter with forced-completion
  semantics (over the axon relay, ``block_until_ready`` can return at
  enqueue time; ``mark`` fetches a tiny slice of the last output to pin the
  measurement to real completion).
* ``trace`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-viewable device trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


class Throughput:
    def __init__(self, num_chips: int = 1):
        self.num_chips = num_chips
        self.reset()

    def reset(self):
        self._count = 0
        self._start = None
        self._elapsed = 0.0

    def start(self):
        self._start = time.perf_counter()

    def mark(self, num_items: int, result=None):
        """Record ``num_items`` processed; ``result`` (a jax array) is
        fetched to force completion of the pipeline up to here."""
        if result is not None:
            np.asarray(result if getattr(result, "ndim", 0) == 0
                       else result.ravel()[0])
        if self._start is None:
            self.start()
            return
        self._count += num_items
        self._elapsed = time.perf_counter() - self._start

    @property
    def items_per_sec(self) -> float:
        return self._count / self._elapsed if self._elapsed else 0.0

    @property
    def items_per_sec_per_chip(self) -> float:
        return self.items_per_sec / self.num_chips

    def summary(self, unit: str = "imgs") -> str:
        return (f"{self.items_per_sec:.2f} {unit}/s "
                f"({self.items_per_sec_per_chip:.2f} {unit}/s/chip)")


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Device trace via jax.profiler when ``log_dir`` is set; no-op
    otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
