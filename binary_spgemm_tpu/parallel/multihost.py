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
    "dist_spgemm_from_local",
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


def dist_spgemm_from_local(a_local, bounds, b, mesh=None):
    """Multi-host C = A·B where THIS process holds only its row slice of A.

    The fully memory-scalable ingest→multiply pipeline (the reference
    materialises all of A on every rank, final/SpGEMM_mpi_omp.c:309):

        bounds = partition_rows(np.ones(n), jax.device_count())   # or by flops
        lo, hi = multihost.process_row_range(bounds, mesh)
        a_local = read_pattern(path, row_range=(lo, hi))   # O(local nnz)
        c = multihost.dist_spgemm_from_local(a_local, bounds, b, mesh)

    ``a_local`` is the ``(hi-lo, m)``-shaped slice; ``bounds`` is the global
    per-device row partition (identical on every process); B is replicated
    (the reference's semantics).  Shard padding is agreed globally with one
    tiny ``process_allgather``; the SPMD step and assembly are exactly
    :func:`.dist_spgemm.dist_spgemm_sharded`'s.  Result: the full C on every
    process (the symmetric gather-to-root analogue).
    """
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.spgemm import pad_bucket, pad_chunk_csr
    from .dist_spgemm import _assemble_sharded, dist_spgemm_sharded

    mesh = mesh if mesh is not None else global_row_mesh()
    bounds = np.asarray(bounds, np.int64)
    n_shards = mesh.devices.size
    if len(bounds) != n_shards + 1:
        raise ValueError(
            f"bounds has {len(bounds) - 1} shards, mesh has {n_shards}"
        )
    lo, hi = process_row_range(bounds, mesh)
    if a_local.shape[0] != hi - lo:
        raise ValueError(
            f"a_local has {a_local.shape[0]} rows, this process owns "
            f"[{lo}, {hi})"
        )
    n = int(bounds[-1])
    m = b.n_cols
    rows_pad = pad_bucket(int(np.max(np.diff(bounds))) or 1, minimum=1)

    # Global shard-padding agreement: every process contributes its local
    # shards' nnz / flop maxima (one tiny allgather ≡ MPI_Allreduce(MAX)).
    blen = np.diff(b.indptr).astype(np.int64)
    local_nnz_max = local_flops_max = 0
    local_shards = {}
    for s in range(n_shards):
        r0, r1 = int(bounds[s]), int(bounds[s + 1])
        if r0 < lo or r1 > hi:
            continue
        nnz_s = int(a_local.indptr[r1 - lo] - a_local.indptr[r0 - lo])
        fl = int(
            blen[
                a_local.indices[
                    a_local.indptr[r0 - lo] : a_local.indptr[r1 - lo]
                ]
            ].sum()
        )
        local_nnz_max = max(local_nnz_max, nnz_s)
        local_flops_max = max(local_flops_max, fl)
        local_shards[s] = (r0, r1)
    agreed = multihost_utils.process_allgather(
        np.asarray([local_nnz_max, local_flops_max], np.int64)
    )
    nnz_pad = pad_bucket(int(agreed[..., 0].max()) or 1, minimum=1)
    flops_pad = pad_bucket(int(agreed[..., 1].max()) or 8)

    shard = NamedSharding(mesh, P(ROWS_AXIS))
    repl = NamedSharding(mesh, P())

    def _mk(shape, sharding, cb):
        return jax.make_array_from_callback(shape, sharding, cb)

    def _local_block(s):
        r0, r1 = local_shards[s]
        ptr, idx, nnz_local = pad_chunk_csr(
            a_local, r0 - lo, r1 - lo, rows_pad, nnz_pad
        )
        return ptr, idx, np.asarray([nnz_local], np.int32)

    a_ptr = _mk(
        (n_shards, rows_pad + 1), shard,
        lambda i: _local_block(int(i[0].start))[0][None],
    )
    a_idx = _mk(
        (n_shards, nnz_pad), shard,
        lambda i: _local_block(int(i[0].start))[1][None],
    )
    a_nnz = _mk(
        (n_shards, 1), shard,
        lambda i: _local_block(int(i[0].start))[2][None],
    )
    b_ptr_np = np.ascontiguousarray(b.indptr, np.int32)
    b_idx_np = np.ascontiguousarray(b.indices, np.int32)
    b_ptr = _mk((b.n_rows + 1,), repl, lambda i: b_ptr_np[i])
    b_idx = _mk((b.nnz,), repl, lambda i: b_idx_np[i])

    c_ptr, c_idx, nnz_sh, total = dist_spgemm_sharded(
        a_ptr, a_idx, a_nnz, b_ptr, b_idx,
        mesh=mesh, n_cols=m, flops_pad=int(flops_pad),
    )
    return _assemble_sharded(c_ptr, c_idx, nnz_sh, total, bounds, (n, m))


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
