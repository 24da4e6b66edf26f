"""Shared provenance stamping for the A/B harnesses.

The reference's benchmark contract is one self-describing CSV line per run
(README.md:19-21, final/SpGEMM_mpi_omp.c:336).  The side harnesses here
(ab_*.py) eroded that discipline in round 2 — rows without timestamps,
bit-exact flags, or roofline fractions can't be trusted round-over-round.
Every harness row now passes through :func:`stamp` before being printed or
appended to results.jsonl.
"""
from __future__ import annotations

import json
import os
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")


def stamp(rec: dict, **extra) -> dict:
    """Add ISO timestamp (+ any extra fields) to a result row, in place."""
    rec.update(extra)
    rec.setdefault("ts", time.strftime("%Y-%m-%dT%H:%M:%S"))
    return rec


def emit(rec: dict, fh=None) -> dict:
    """Stamp, print, and append one row to results.jsonl."""
    stamp(rec)
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")
    return rec


def sort_fraction(ex, seconds: float) -> float:
    """Roofline fraction for one EllSpGEMMExecutor run (sort model)."""
    import jax

    from binary_spgemm_tpu.utils.trace import roofline

    r = roofline(
        ex.total_slots, 0, 0, seconds, jax.devices()[0], sort_len=ex.sort_pad
    )
    return round(r["fraction_of_roofline"], 4)
