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


def is_timed(rec: dict) -> bool:
    """A row that reports an engine/kernel duration (any ``*_s`` field, the
    short A/B keys ``t``/``seconds``, or a rate field)."""
    return any(
        k == "t" or k == "seconds" or k.endswith("_s") or k.endswith("ns_per_elem")
        for k in rec
    )


def emit(rec: dict, fh=None) -> dict:
    """Stamp, print, and append one row to results.jsonl.

    Provenance contract (round-4 hardening of the reference's
    one-self-describing-line-per-run protocol, README.md:19-21): a row that
    TIMES anything must carry ``bit_exact`` — True/False when the harness
    compared outputs that run, or the literal string ``"n/a"`` for pure rate
    microbenchmarks where bit-exactness is meaningless.  ``None``/missing is
    refused: an untagged timed row can't be trusted round-over-round.
    """
    stamp(rec)
    if "error" not in rec and is_timed(rec):
        be = rec.get("bit_exact")
        if be is None or not (isinstance(be, bool) or be == "n/a"):
            raise ValueError(
                "provenance: timed row requires bit_exact True/False/'n/a' "
                f"(got {be!r}): {json.dumps(rec)[:200]}"
            )
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
