"""Benchmark timing helpers (≡ tic/toc + stats, final/utils.c:104-113, :330-333).

The reference reports mean / median / fastest of ``times`` barrier-synced repeats
(final/SpGEMM_mpi_omp.c:318-336).  ``BenchStats`` reproduces that report.
"""
from __future__ import annotations

import dataclasses
import statistics
import time

__all__ = ["Timer", "BenchStats", "bench_fn"]


class Timer:
    """Monotonic region timer (≡ tic/toc macros, final/utils.h:7-8)."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.start
        return False


@dataclasses.dataclass
class BenchStats:
    times: list[float]

    @property
    def mean(self) -> float:
        return statistics.fmean(self.times)

    @property
    def median(self) -> float:
        return statistics.median(self.times)

    @property
    def fastest(self) -> float:
        return min(self.times)


def bench_fn(fn, *, repeats: int, barrier=None) -> BenchStats:
    """Time ``fn()`` ``repeats`` times; ``barrier`` (if given) syncs before each run."""
    times = []
    for _ in range(repeats):
        if barrier is not None:
            barrier()
        with Timer() as t:
            fn()
        times.append(t.seconds)
    return BenchStats(times)
