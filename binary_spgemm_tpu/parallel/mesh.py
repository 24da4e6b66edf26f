"""Device mesh helpers for the row-partitioned SpGEMM.

The reference's distribution model is a 1-D contiguous row partition over MPI
ranks with fully replicated inputs (``SpGEMM_mpi``, final/SpGEMM_mpi_omp.c:155-225).
The TPU-native equivalent is a 1-D ``jax.sharding.Mesh`` over a single ``"rows"``
axis — ICI within a slice, DCN across slices — with shardings expressed as
``NamedSharding``/``PartitionSpec`` and assembly done with XLA collectives
instead of MPI_Gatherv.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_row_mesh", "partition_rows", "ROWS_AXIS"]

ROWS_AXIS = "rows"


def make_row_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the row-partition axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[: n_devices]
    return jax.make_mesh((len(devices),), (ROWS_AXIS,), devices=devices)


def partition_rows(
    row_weights: np.ndarray, n_shards: int, *, balance: str = "flops"
) -> np.ndarray:
    """Contiguous row partition boundaries (length ``n_shards + 1``).

    ``balance="rows"`` reproduces the reference's equal-rows split
    (``tasksize = An / numtasks``, final/SpGEMM_mpi_omp.c:165) generalised to
    non-divisible sizes.  ``balance="flops"`` splits at equal cumulative-weight
    quantiles — fixing the reference's known load imbalance on skewed matrices
    (its ``schedule(dynamic)`` experiment, old/SpGEMM_omp.c:264).
    """
    n = len(row_weights)
    if balance == "rows":
        bounds = np.linspace(0, n, n_shards + 1)
        return np.round(bounds).astype(np.int64)
    if balance != "flops":
        raise ValueError(f"unknown balance mode {balance!r}")
    cum = np.cumsum(np.asarray(row_weights, dtype=np.int64))
    total = cum[-1] if n else 0
    if total == 0:
        return np.round(np.linspace(0, n, n_shards + 1)).astype(np.int64)
    targets = total * np.arange(1, n_shards, dtype=np.float64) / n_shards
    # boundary after the row that crosses each quantile target
    cuts = np.minimum(np.searchsorted(cum, targets, side="left") + 1, n)
    bounds = np.concatenate([[0], cuts, [n]])
    return np.maximum.accumulate(bounds).astype(np.int64)
