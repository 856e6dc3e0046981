"""Tracing/profiling helpers (SURVEY.md §6 "Tracing / profiling").

The reference only recorded wall-clock into results files; here runs can
capture full XLA/TPU traces viewable in XProf/TensorBoard, plus
lightweight phase timers that land in the results JSON.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

__all__ = ["trace", "PhaseTimer"]


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler trace around a block.

    with profiling.trace("/tmp/tb"):
        samples, stats = run_hmc(...)
        jax.block_until_ready(samples)

    View with: tensorboard --logdir /tmp/tb  (profile plugin), or xprof.
    No-op when log_dir is None.
    """
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulate named wall-clock phases; export to the results JSON."""

    def __init__(self):
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.phases[name] = (self.phases.get(name, 0.0)
                                 + time.perf_counter() - t0)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.phases)
