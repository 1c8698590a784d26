"""Run tracing: steps/sec + ESS/sec counters and jax.profiler capture.

The reference's only instrumentation is wall-clock prints (SURVEY.md #5:
network.py:566, 666-667). This module provides the build's observability
layer: a lightweight ``RunTracer`` the driver feeds per-chunk, producing the
BASELINE metrics (leapfrog steps/sec, ESS/sec) and a structured summary; and
``profile()`` wrapping ``jax.profiler.trace`` for on-demand XLA traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class ChunkRecord:
    epochs: int
    #: executed leapfrog kicks per chain per epoch — in grouped-adaptation
    #: runs this is the group-size-weighted mean L (mask-frozen chains do
    #: not kick while the straggler group finishes), so it may be non-int
    leapfrog: float
    n_chains: int
    seconds: float
    #: the straggler group's L — what every chain *pays in wall clock*
    #: each epoch (equals ``leapfrog`` for shared-adapter runs)
    max_leapfrog: float = None

    def __post_init__(self):
        if self.max_leapfrog is None:
            self.max_leapfrog = self.leapfrog


class RunTracer:
    """Accumulates per-chunk timing into throughput counters."""

    def __init__(self):
        self.chunks: List[ChunkRecord] = []
        self._t0: Optional[float] = None

    def start_chunk(self):
        self._t0 = time.perf_counter()

    def end_chunk(self, epochs: int, leapfrog: float, n_chains: int,
                  max_leapfrog: float = None):
        if self._t0 is None:
            return
        self.chunks.append(ChunkRecord(
            epochs, leapfrog, n_chains, time.perf_counter() - self._t0,
            max_leapfrog))
        self._t0 = None

    @property
    def total_seconds(self) -> float:
        return sum(c.seconds for c in self.chunks)

    @property
    def total_leapfrog_steps(self) -> int:
        """Main-chain leapfrog position updates *executed* across all
        chains (grouped-adaptation chunks count each chain at its own
        group's L, not the straggler group's max)."""
        return int(round(sum(c.epochs * c.leapfrog * c.n_chains
                             for c in self.chunks)))

    @property
    def leapfrog_steps_per_sec(self) -> float:
        t = self.total_seconds
        return self.total_leapfrog_steps / t if t > 0 else float("nan")

    def ess_per_sec(self, sample_series: np.ndarray) -> float:
        """ESS/sec of a (draws, chains) scalar summary series (the BASELINE
        quality-adjusted throughput metric)."""
        from tensorbnn_tpu.utils.diagnostics import multichain_ess
        series = np.asarray(sample_series)
        if series.ndim == 1:
            series = series[:, None]
        ess = multichain_ess(series[:, :, None] if series.ndim == 2
                             else series)
        t = self.total_seconds
        return ess / t if t > 0 else float("nan")

    @property
    def straggler_efficiency(self) -> float:
        """Mean executed L / straggler-paid L over the run (1.0 for
        shared-adapter runs; below 1, the fraction of the wave-front's
        wall the average chain actually kicks through — the grouped-
        adaptation straggler cost)."""
        paid = sum(c.epochs * c.max_leapfrog for c in self.chunks)
        done = sum(c.epochs * c.leapfrog for c in self.chunks)
        return done / paid if paid > 0 else float("nan")

    def summary(self) -> dict:
        return {
            "chunks": len(self.chunks),
            "epochs": sum(c.epochs for c in self.chunks),
            "total_seconds": round(self.total_seconds, 4),
            "leapfrog_steps": self.total_leapfrog_steps,
            "leapfrog_steps_per_sec": round(self.leapfrog_steps_per_sec, 1),
            "straggler_efficiency": round(self.straggler_efficiency, 4),
        }


@contextlib.contextmanager
def profile(log_dir: Optional[str] = None):
    """Captures a jax.profiler trace around the enclosed block when
    ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield
