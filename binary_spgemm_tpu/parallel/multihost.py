"""Multi-host (pod / pod-slice) execution glue.

The reference reaches multiple nodes via ``mpirun``/``srun`` process launch +
MPI collectives (final/SpGEMM_mpi_omp.c:346-366).  The TPU-native equivalent is
`jax.distributed`: one process per host, the SAME SPMD program as the
single-host path (:mod:`.dist_spgemm`) over a global mesh whose collectives
ride ICI within a slice and DCN across slices.

Usage on each host of a pod slice::

    from binary_spgemm_tpu.parallel import multihost
    multihost.initialize()                  # env-driven (TPU pods auto-detect)
    mesh = multihost.global_row_mesh()
    a = read_pattern(path)                  # every host reads the full file —
                                            # the reference's replicated-ingest
                                            # semantics (final:309)
    c = dist_spgemm(a, a, mesh)             # device-sharded result

Notes:

* ``dist_spgemm``'s host assembly detects multi-process execution and
  all-gathers the sharded outputs (every process gets the full result — the
  gather-to-root analogue made symmetric).  Avoid it in inner loops: that
  serialisation is exactly the reference's measured multi-node bottleneck
  (report §3 figs 9-10); keep results device-sharded between SPMD steps.
* barriers for benchmarking come from ``sync_global_devices`` (≡ MPI_Barrier,
  final:319).
"""
from __future__ import annotations

import numpy as np

import jax

from .mesh import ROWS_AXIS

__all__ = [
    "initialize",
    "global_row_mesh",
    "barrier",
    "process_row_range",
]


def initialize(**kwargs) -> None:
    """``jax.distributed.initialize`` with env-driven defaults.

    On TPU pods the coordinator/process ids auto-detect from the metadata
    server; elsewhere pass ``coordinator_address``, ``num_processes``,
    ``process_id`` explicitly (≡ the information mpirun distributes).
    No-op if already initialized.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def global_row_mesh():
    """1-D mesh over every device of every host (the MPI_COMM_WORLD analogue)."""
    return jax.make_mesh((jax.device_count(),), (ROWS_AXIS,))


def barrier(name: str = "binary-spgemm") -> None:
    """Cross-host barrier (≡ MPI_Barrier before timing, final:319)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def process_row_range(bounds: np.ndarray, mesh) -> tuple[int, int]:
    """The contiguous row range owned by THIS process's devices.

    ``bounds`` is the global partition from :func:`.mesh.partition_rows` (one
    entry per device).  Useful for host-side sharded ingest: each process can
    slice its own rows from a file instead of materialising all of A.
    """
    local = set(d.id for d in jax.local_devices())
    mine = [
        i
        for i, d in enumerate(mesh.devices.flat)
        if getattr(d, "id", None) in local
    ]
    if not mine:
        return (0, 0)
    return int(bounds[min(mine)]), int(bounds[max(mine) + 1])
