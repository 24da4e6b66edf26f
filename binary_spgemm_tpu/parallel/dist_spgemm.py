"""Row-partitioned multi-chip boolean SpGEMM over a device mesh.

TPU-native re-design of the reference's MPI layer (``SpGEMM_mpi``,
final/SpGEMM_mpi_omp.c:155-225):

========================================  =========================================
reference (MPI)                           this module (mesh / shard_map)
========================================  =========================================
rank owns ``An/numtasks`` contiguous      shard owns a contiguous row range from
rows (equal-rows, divisibility req.)      :func:`..parallel.mesh.partition_rows`
                                          (flop-balanced by default, any n)
inputs replicated: every rank reads       B (and A's full index arrays) replicated
the whole file (:309)                     across the mesh; A's row slice sharded
``SpGEMM_omp`` per rank                   :func:`..ops.spgemm.esc_spgemm` per shard
                                          inside one ``shard_map``-ped jit
``MPI_Reduce`` of nnz (:178)              ``lax.psum`` over the mesh axis
``MPI_Gather`` of counts (:186)           ``lax.all_gather`` of per-shard nnz
``MPI_Gatherv`` + root prefix fix         per-shard global offset = exclusive sum
(:203-223)                                of gathered counts; output stays
                                          sharded, host assembles (or stays on
                                          device for further sharded compute)
========================================  =========================================

Everything compiles to one XLA program per shape bucket; the collectives ride
ICI.  The output remains device-sharded — unlike the reference, which serialises
through rank 0 (its measured multi-node slowdown, report §3 figs 9-10).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.bcsr import BCSR
from ..ops.spgemm import (
    INT,
    esc_spgemm,
    expand_pairs,
    pad_bucket,
    row_flops,
    sort_compress,
)
from .mesh import ROWS_AXIS, make_row_mesh, partition_rows

__all__ = [
    "ShardedOperands",
    "dist_spgemm",
    "dist_masked_spgemm",
    "dist_spm_or",
    "dist_spgemm_or",
    "dist_triangle_count",
    "dist_triangle_sum_ell",
    "dist_spgemm_counts",
    "dist_masked_spgemm_counts",
    "dist_spgemm_sharded",
    "dist_spgemm_sharded_b",
    "dist_spgemm_ell",
    "dist_spgemm_ring",
    "dist_spgemm_ring_ell",
    "dist_masked_spgemm_sharded",
    "dist_masked_spgemm_ell",
    "dist_spgemm_or_ell",
    "ring_step_pad",
    "shard_operands",
    "shard_b_operands",
]


@dataclasses.dataclass
class ShardedOperands:
    """Device-ready stacked operands for the row-partitioned product."""

    mesh: Mesh
    bounds: np.ndarray  # [S+1] row partition boundaries
    rows_pad: int
    a_ptr: jax.Array  # [S, rows_pad+1] shard-local row pointers (sharded)
    a_idx: jax.Array  # [S, nnz_pad]   shard-local column indices (sharded)
    a_nnz: jax.Array  # [S, 1]          valid nnz per shard (sharded)
    b_ptr: jax.Array  # [m+1]           replicated
    b_idx: jax.Array  # [nnz_b]         replicated
    flops_pad: int
    shape: tuple[int, int]


def shard_operands(
    a: BCSR,
    b: BCSR,
    mesh: Mesh | None = None,
    *,
    balance: str = "flops",
    flops_pad: int | None = None,
) -> ShardedOperands:
    """Partition A's rows across the mesh and lay out device-sharded operands.

    All shards share one padded shape (single compile); B is replicated —
    the reference's semantics (every rank holds the full B, :309).
    """
    if mesh is None:
        mesh = make_row_mesh()
    n_shards = mesh.devices.size
    rf = row_flops(a, b)
    bounds = partition_rows(rf, n_shards, balance=balance)
    rows_pad = pad_bucket(int(np.max(np.diff(bounds))), minimum=1)
    nnz_pad = pad_bucket(
        int(max(a.indptr[r1] - a.indptr[r0] for r0, r1 in zip(bounds, bounds[1:])))
    )
    if flops_pad is None:
        flops_pad = pad_bucket(
            int(max(rf[r0:r1].sum() for r0, r1 in zip(bounds, bounds[1:])))
        )

    ptrs = np.zeros((n_shards, rows_pad + 1), np.int32)
    idxs = np.zeros((n_shards, nnz_pad), np.int32)
    nnzs = np.zeros((n_shards, 1), np.int32)
    for s, (r0, r1) in enumerate(zip(bounds, bounds[1:])):
        nnz_local = int(a.indptr[r1] - a.indptr[r0])
        ptrs[s, : r1 - r0 + 1] = a.indptr[r0 : r1 + 1] - a.indptr[r0]
        ptrs[s, r1 - r0 + 1 :] = nnz_local
        idxs[s, :nnz_local] = a.indices[a.indptr[r0] : a.indptr[r1]]
        nnzs[s, 0] = nnz_local

    shard = NamedSharding(mesh, P(ROWS_AXIS))
    repl = NamedSharding(mesh, P())
    return ShardedOperands(
        mesh=mesh,
        bounds=bounds,
        rows_pad=rows_pad,
        a_ptr=jax.device_put(ptrs, shard),
        a_idx=jax.device_put(idxs, shard),
        a_nnz=jax.device_put(nnzs, shard),
        b_ptr=jax.device_put(np.asarray(b.indptr), repl),
        b_idx=jax.device_put(np.asarray(b.indices), repl),
        flops_pad=int(flops_pad),
        shape=(a.n_rows, b.n_cols),
    )


def _assembly_epilogue(c_ptr, c_idx, nnz_c):
    """Shared SPMD assembly tail: replicated total nnz + per-shard global
    offset for the row pointers (≡ MPI_Reduce + MPI_Gather + displacement
    scan, final/SpGEMM_mpi_omp.c:178-196)."""
    total = jax.lax.psum(nnz_c, ROWS_AXIS)
    counts = jax.lax.all_gather(nnz_c, ROWS_AXIS)
    me = jax.lax.axis_index(ROWS_AXIS)
    offset = jnp.sum(
        jnp.where(jnp.arange(counts.shape[0], dtype=INT) < me, counts, 0),
        dtype=INT,
    )
    return (c_ptr + offset)[None], c_idx[None], nnz_c[None, None], total


@functools.partial(
    jax.jit, static_argnames=("mesh", "n_cols", "flops_pad")
)
def dist_spgemm_sharded(
    a_ptr: jax.Array,
    a_idx: jax.Array,
    a_nnz: jax.Array,
    b_ptr: jax.Array,
    b_idx: jax.Array,
    *,
    mesh: Mesh,
    n_cols: int,
    flops_pad: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One jitted SPMD step: per-shard ESC SpGEMM + cross-shard assembly.

    Returns (sharded global row pointers [S, rows_pad+1], sharded padded column
    indices [S, flops_pad], per-shard nnz [S, 1], replicated total nnz scalar).
    Row pointers come back *globally prefix-fixed* — the shard_map equivalent of
    the reference's root-side fix (final/SpGEMM_mpi_omp.c:211-223).
    """

    def shard_fn(a_ptr, a_idx, a_nnz, b_ptr, b_idx):
        c_ptr, c_idx, nnz_c = esc_spgemm(
            a_ptr[0], a_idx[0], a_nnz[0, 0], b_ptr, b_idx,
            n_cols=n_cols, flops_pad=flops_pad,
        )
        # ≡ MPI_Reduce(:178) + MPI_Gather(:186) + displacement scan (:190-196)
        return _assembly_epilogue(c_ptr, c_idx, nnz_c)

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(), P()),
        out_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P()),
    )(a_ptr, a_idx, a_nnz, b_ptr, b_idx)


@functools.partial(
    jax.jit, static_argnames=("mesh", "n_cols", "flops_pad")
)
def dist_masked_spgemm_sharded(
    a_ptr: jax.Array,
    a_idx: jax.Array,
    a_nnz: jax.Array,
    f_ptr: jax.Array,  # [S, rows_pad+1] shard-local mask row pointers
    f_idx: jax.Array,  # [S, f_pad] mask indices (canonical, fill n_cols)
    b_ptr: jax.Array,
    b_idx: jax.Array,
    *,
    mesh: Mesh,
    n_cols: int,
    flops_pad: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """SPMD masked multiply C = F .* (A·B): per-shard ESC expansion with the
    sort-fused mask join (``sort_compress_masked``) + the shared cross-shard
    assembly.  The reference only *declared* its masked kernel parallelisable
    ("can easily be parallelized exactly as above",
    final/SpGEMM_mpi_omp.c:229) — this is that layer, SPMD-native: F is
    row-sharded with A (same bounds), B replicated, output sharded with
    globally prefix-fixed row pointers.
    """
    from ..ops.spgemm import _row_ids, sort_compress_masked

    rows_pad = a_ptr.shape[-1] - 1

    def shard_fn(a_ptr, a_idx, a_nnz, f_ptr, f_idx, b_ptr, b_idx):
        row, col = expand_pairs(
            a_ptr[0], a_idx[0], a_nnz[0, 0], b_ptr, b_idx,
            n_cols=n_cols, flops_pad=flops_pad,
        )
        f_rows = _row_ids(f_ptr[0], f_idx.shape[-1])
        c_ptr, c_idx, nnz_c = sort_compress_masked(
            row, col, f_rows, f_idx[0], f_ptr[0][-1], rows_pad, n_cols
        )
        return _assembly_epilogue(c_ptr, c_idx, nnz_c)

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS),
            P(ROWS_AXIS), P(ROWS_AXIS), P(), P(),
        ),
        out_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P()),
    )(a_ptr, a_idx, a_nnz, f_ptr, f_idx, b_ptr, b_idx)


def _shard_rows_csr(f: BCSR, bounds: np.ndarray, rows_pad: int, mesh: Mesh):
    """Row-slice a matrix by the shard bounds into stacked padded shard-local
    CSR arrays (fill = n_cols sentinels).  Used for every same-row-space
    side operand of the SPMD ops (mask F, union/fused D, union B).  Returns
    ``(ptrs [S, rows_pad+1], idxs [S, pad], nnzs [S, 1])`` device arrays."""
    n_shards = len(bounds) - 1
    f_pad = pad_bucket(
        max(
            (int(f.indptr[r1] - f.indptr[r0]) for r0, r1 in
             zip(bounds, bounds[1:])),
            default=1,
        ),
        minimum=1,
    )
    ptrs = np.zeros((n_shards, rows_pad + 1), np.int32)
    idxs = np.full((n_shards, f_pad), f.n_cols, np.int32)
    nnzs = np.zeros((n_shards, 1), np.int32)
    for s, (r0, r1) in enumerate(zip(bounds, bounds[1:])):
        nnz_local = int(f.indptr[r1] - f.indptr[r0])
        ptrs[s, : r1 - r0 + 1] = f.indptr[r0 : r1 + 1] - f.indptr[r0]
        ptrs[s, r1 - r0 + 1 :] = nnz_local
        idxs[s, :nnz_local] = f.indices[f.indptr[r0] : f.indptr[r1]]
        nnzs[s, 0] = nnz_local
    shard = NamedSharding(mesh, P(ROWS_AXIS))
    return (
        jax.device_put(ptrs, shard),
        jax.device_put(idxs, shard),
        jax.device_put(nnzs, shard),
    )


def dist_masked_spgemm(
    f: BCSR,
    a: BCSR,
    b: BCSR,
    mesh: Mesh | None = None,
    *,
    balance: str = "flops",
    engine: str = "auto",
) -> BCSR:
    """Multi-chip masked structure C = F .* (A·B) (≡ SpGEMM_masked under the
    row partition the reference declared but never built,
    final/SpGEMM_mpi_omp.c:229-232).  F is canonicalised host-side and
    row-sharded with A; assembly matches :func:`dist_spgemm`.

    ``engine``: like :func:`dist_spgemm` — ``"auto"`` takes the sliced-ELL
    per-shard expansion when it fits, ``"esc"``/``"ell"`` force."""
    if a.n_cols != b.n_rows or tuple(f.shape) != (a.n_rows, b.n_cols):
        raise ValueError(f"shape mismatch: F{f.shape} vs {a.shape} @ {b.shape}")
    if engine not in ("auto", "esc", "ell"):
        raise ValueError(f"unknown engine {engine!r}")
    from ..ops.spgemm import require_int32_operands

    require_int32_operands(f, a, b)
    n, m = a.n_rows, b.n_cols
    if a.nnz == 0 or b.nnz == 0 or f.nnz == 0:
        return BCSR(np.zeros(n + 1, np.int32), np.zeros(0, np.int32), (n, m))
    f = f.sum_duplicates()

    if engine in ("auto", "ell"):
        from ..ops.ell import AUTO_ELL_MAX_SLOTS

        mesh_ = mesh if mesh is not None else make_row_mesh()
        rf = row_flops(a, b)
        bounds = partition_rows(rf, mesh_.devices.size, balance=balance)
        try:
            (tables, er, ep, widths, pads, rows_pad, sort_pad, sub_bounds,
             _) = _shard_ell_operands(
                a, b, mesh_, bounds, rf, extra_key_bits=1
            )
            fits = sort_pad <= AUTO_ELL_MAX_SLOTS
        except OverflowError:
            if engine == "ell":
                raise
            fits = False
        if fits or engine == "ell":
            f_ptr, f_idx = _shard_ell_csr(f, sub_bounds, rows_pad, mesh_)
            c_ptr, c_idx, nnz_sc, total = dist_masked_spgemm_ell(
                tables, er, ep, f_ptr, f_idx,
                mesh=mesh_, rows_pad=rows_pad, n_cols=m,
                widths=widths, pads=pads, sort_pad=sort_pad,
            )
            return _assemble_subchunked(
                c_ptr, c_idx, nnz_sc, total, sub_bounds, (n, m)
            )

    ops = shard_operands(a, b, mesh, balance=balance)
    f_ptr, f_idx, _ = _shard_rows_csr(f, ops.bounds, ops.rows_pad, ops.mesh)
    c_ptr, c_idx, nnz_sh, total = dist_masked_spgemm_sharded(
        ops.a_ptr, ops.a_idx, ops.a_nnz, f_ptr, f_idx, ops.b_ptr, ops.b_idx,
        mesh=ops.mesh, n_cols=m, flops_pad=ops.flops_pad,
    )
    return _assemble_sharded(c_ptr, c_idx, nnz_sh, total, ops.bounds, (n, m))


@functools.partial(jax.jit, static_argnames=("mesh", "n_cols", "flops_pad"))
def dist_triangle_sum_sharded(
    a_ptr, a_idx, a_nnz, f_ptr, f_idx, b_ptr, b_idx,
    *, mesh: Mesh, n_cols: int, flops_pad: int,
):
    """SPMD wedge sum Σ_{(i,j)∈F} mult((A·B)[i,j]): per-shard ESC expansion +
    the tagged counting join (:func:`..ops.counts.masked_counts_sum`), then a
    two-limb int32 ``psum`` (a shard's sum is < 2³¹ by the flop pad, but the
    global sum may not be — hi/lo limbs keep the reduction exact without
    int64).  Returns the two replicated int32 limbs ``(hi, lo)``;
    total = (hi << 15) + lo.
    """
    from ..ops.counts import masked_counts_sum

    rows_pad = a_ptr.shape[-1] - 1

    def shard_fn(ap, ai, an, fp, fi, bp, bi):
        row, col = expand_pairs(
            ap[0], ai[0], an[0, 0], bp, bi,
            n_cols=n_cols, flops_pad=flops_pad,
        )
        s = masked_counts_sum(
            row, col, fp[0], fi[0], fp[0][-1], rows_pad, n_cols
        )
        return (
            jax.lax.psum(s >> 15, ROWS_AXIS),
            jax.lax.psum(s & 0x7FFF, ROWS_AXIS),
        )

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS),
            P(ROWS_AXIS), P(ROWS_AXIS), P(), P(),
        ),
        out_specs=(P(), P()),
    )(a_ptr, a_idx, a_nnz, f_ptr, f_idx, b_ptr, b_idx)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
    ),
)
def dist_triangle_sum_ell(
    tables: tuple[jax.Array, ...],  # [nc, w] replicated ELL class tables
    entry_rows: tuple[jax.Array, ...],  # [S, C, pad_c] (sharded)
    entry_pos: tuple[jax.Array, ...],
    f_ptr: jax.Array,  # [S, C, rows_pad+1] chunk-local mask row pointers
    f_idx: jax.Array,  # [S, C, f_pad] mask indices (canonical, fill n_cols)
    *,
    mesh: Mesh,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
) -> tuple[jax.Array, jax.Array]:
    """SPMD wedge sum with the sliced-ELL expansion: the sub-chunked plan of
    :func:`dist_spgemm_ell` feeding the tagged counting join
    (:func:`..ops.counts.masked_counts_sum`) per chunk — the ELL form of
    :func:`dist_triangle_sum_sharded`.  Each chunk's int32 sum is split into
    two limbs BEFORE accumulating (a shard's total flops may approach the
    int32 domain); returns the replicated ``(hi, lo)`` limbs,
    total = (hi << 15) + lo."""
    from ..ops.counts import masked_counts_sum

    n_chunks = entry_rows[0].shape[1] if widths else 1
    fill = sort_pad - sum(p * w for p, w in zip(pads, widths))

    def shard_fn(tables, entry_rows, entry_pos, f_ptr, f_idx):
        hi = jnp.zeros((), INT)
        lo = jnp.zeros((), INT)
        for c in range(n_chunks):
            row, col = _ell_expand_chunk(
                tables, entry_rows, entry_pos, c, rows_pad, n_cols, fill
            )
            s = masked_counts_sum(
                row, col, f_ptr[0, c], f_idx[0, c], f_ptr[0, c][-1],
                rows_pad, n_cols,
            )
            hi = hi + (s >> 15)
            lo = lo + (s & 0x7FFF)
        return (
            jax.lax.psum(hi, ROWS_AXIS),
            jax.lax.psum(lo, ROWS_AXIS),
        )

    n_classes = len(widths)
    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            (P(),) * n_classes,
            (P(ROWS_AXIS),) * n_classes,
            (P(ROWS_AXIS),) * n_classes,
            P(ROWS_AXIS),
            P(ROWS_AXIS),
        ),
        out_specs=(P(), P()),
    )(tables, entry_rows, entry_pos, f_ptr, f_idx)


def dist_triangle_count(
    a: BCSR,
    mesh: Mesh | None = None,
    *,
    balance: str = "flops",
    engine: str = "auto",
) -> int:
    """Multi-chip triangle count of the undirected simple graph with
    (symmetric, hollow) adjacency A: each shard reduces its row block's
    wedge sum to one scalar on device — only two int32 limbs ever leave the
    mesh (compare the reference, which gathers the full result to rank 0).

    ``engine``: like :func:`dist_spgemm` — ``"auto"`` takes the sliced-ELL
    per-shard expansion when it fits, ``"esc"``/``"ell"`` force."""
    if a.n_rows != a.n_cols:
        raise ValueError("triangles need a square matrix")
    if engine not in ("auto", "esc", "ell"):
        raise ValueError(f"unknown engine {engine!r}")
    from ..ops.spgemm import require_int32_operands

    require_int32_operands(a)
    if a.nnz == 0:
        return 0
    a = a.sum_duplicates()

    if engine in ("auto", "ell"):
        from ..ops.ell import AUTO_ELL_MAX_SLOTS

        mesh_ = mesh if mesh is not None else make_row_mesh()
        rf = row_flops(a, a)
        bounds = partition_rows(rf, mesh_.devices.size, balance=balance)
        try:
            (tables, er, ep, widths, pads, rows_pad, sort_pad, sub_bounds,
             _) = _shard_ell_operands(
                a, a, mesh_, bounds, rf, extra_key_bits=1
            )
            fits = sort_pad <= AUTO_ELL_MAX_SLOTS
        except OverflowError:
            if engine == "ell":
                raise
            fits = False
        if fits or engine == "ell":
            f_ptr, f_idx = _shard_ell_csr(a, sub_bounds, rows_pad, mesh_)
            hi, lo = dist_triangle_sum_ell(
                tables, er, ep, f_ptr, f_idx,
                mesh=mesh_, rows_pad=rows_pad, n_cols=a.n_cols,
                widths=widths, pads=pads, sort_pad=sort_pad,
            )
            total = (int(hi) << 15) + int(lo)
            if total % 6:
                raise ValueError(
                    "edge-incident wedge sum not divisible by 6 — adjacency "
                    "must be symmetric with an empty diagonal"
                )
            return total // 6

    ops = shard_operands(a, a, mesh, balance=balance)
    f_ptr, f_idx, _ = _shard_rows_csr(a, ops.bounds, ops.rows_pad, ops.mesh)
    hi, lo = dist_triangle_sum_sharded(
        ops.a_ptr, ops.a_idx, ops.a_nnz, f_ptr, f_idx, ops.b_ptr, ops.b_idx,
        mesh=ops.mesh, n_cols=a.n_cols, flops_pad=ops.flops_pad,
    )
    total = (int(hi) << 15) + int(lo)
    if total % 6:
        raise ValueError(
            "edge-incident wedge sum not divisible by 6 — adjacency must be "
            "symmetric with an empty diagonal"
        )
    return total // 6


@functools.partial(jax.jit, static_argnames=("mesh", "n_cols", "flops_pad"))
def dist_spgemm_counts_sharded(
    a_ptr, a_idx, a_nnz, b_ptr, b_idx, *, mesh: Mesh, n_cols: int,
    flops_pad: int,
):
    """SPMD counting multiply C = A·B with per-entry multiplicities: per-shard
    ESC expansion + :func:`..ops.counts.sort_compress_counts`, shared
    assembly with the counts riding as a fifth (sharded) output."""
    from ..ops.counts import sort_compress_counts

    rows_pad = a_ptr.shape[-1] - 1

    def shard_fn(a_ptr, a_idx, a_nnz, b_ptr, b_idx):
        row, col = expand_pairs(
            a_ptr[0], a_idx[0], a_nnz[0, 0], b_ptr, b_idx,
            n_cols=n_cols, flops_pad=flops_pad,
        )
        c_ptr, c_idx, c_cnt, nnz_c = sort_compress_counts(
            row, col, rows_pad, n_cols
        )
        ptr, idx, nnz, total = _assembly_epilogue(c_ptr, c_idx, nnz_c)
        return ptr, idx, c_cnt[None], nnz, total

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(), P()),
        out_specs=(
            P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(),
        ),
    )(a_ptr, a_idx, a_nnz, b_ptr, b_idx)


@functools.partial(jax.jit, static_argnames=("mesh", "n_cols", "flops_pad"))
def dist_masked_spgemm_counts_sharded(
    a_ptr, a_idx, a_nnz, f_ptr, f_idx, b_ptr, b_idx,
    *, mesh: Mesh, n_cols: int, flops_pad: int,
):
    """SPMD masked counting multiply C = F .* (A·B) with multiplicities:
    per-shard ESC expansion + :func:`..ops.counts.masked_counts_compress`
    (F row-sharded with A), shared assembly with a counts payload."""
    from ..ops.counts import masked_counts_compress

    rows_pad = a_ptr.shape[-1] - 1

    def shard_fn(a_ptr, a_idx, a_nnz, f_ptr, f_idx, b_ptr, b_idx):
        row, col = expand_pairs(
            a_ptr[0], a_idx[0], a_nnz[0, 0], b_ptr, b_idx,
            n_cols=n_cols, flops_pad=flops_pad,
        )
        f_pad = f_idx.shape[-1]
        c_ptr, c_idx, c_cnt, nnz_c = masked_counts_compress(
            row, col, f_ptr[0], f_idx[0], f_ptr[0][-1], rows_pad, n_cols
        )
        # valid entries never exceed the mask's nnz — truncate the padded
        # (flops_pad + f_pad)-slot outputs to the mask pad
        ptr, idx, nnz, total = _assembly_epilogue(
            c_ptr, c_idx[:f_pad], nnz_c
        )
        return ptr, idx, c_cnt[:f_pad][None], nnz, total

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS),
            P(ROWS_AXIS), P(ROWS_AXIS), P(), P(),
        ),
        out_specs=(
            P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(),
        ),
    )(a_ptr, a_idx, a_nnz, f_ptr, f_idx, b_ptr, b_idx)


def _two_level_ptr_fix_counts(outs):
    """:func:`_two_level_ptr_fix` for per-chunk ``(ptr, idx, cnt, nnz)``
    quadruples: the counts stack rides along unfixed (it is positional
    payload, not pointers)."""
    ptr, idx, nnzs, total = _two_level_ptr_fix(
        [(p, i, n) for p, i, _, n in outs]
    )
    cnt = jnp.stack([o[2] for o in outs])
    return ptr, idx, cnt[None], nnzs, total


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "rows_pad", "n_cols", "widths", "pads", "sort_pad"),
)
def dist_spgemm_counts_ell(
    tables: tuple[jax.Array, ...],
    entry_rows: tuple[jax.Array, ...],  # [S, C, pad_c] (sharded)
    entry_pos: tuple[jax.Array, ...],
    *,
    mesh: Mesh,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
):
    """Counting SPMD step with the sliced-ELL expansion: the sub-chunked
    plan of :func:`dist_spgemm_ell` with
    :func:`..ops.counts.sort_compress_counts` replacing the plain compress."""
    from ..ops.counts import sort_compress_counts

    n_chunks = entry_rows[0].shape[1] if widths else 1
    fill = sort_pad - sum(p * w for p, w in zip(pads, widths))

    def shard_fn(tables, entry_rows, entry_pos):
        outs = []
        for c in range(n_chunks):
            row, col = _ell_expand_chunk(
                tables, entry_rows, entry_pos, c, rows_pad, n_cols, fill
            )
            outs.append(sort_compress_counts(row, col, rows_pad, n_cols))
        return _two_level_ptr_fix_counts(outs)

    n_classes = len(widths)
    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            (P(),) * n_classes,
            (P(ROWS_AXIS),) * n_classes,
            (P(ROWS_AXIS),) * n_classes,
        ),
        out_specs=(
            P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(),
        ),
    )(tables, entry_rows, entry_pos)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "rows_pad", "n_cols", "widths", "pads", "sort_pad"),
)
def dist_masked_spgemm_counts_ell(
    tables: tuple[jax.Array, ...],
    entry_rows: tuple[jax.Array, ...],  # [S, C, pad_c] (sharded)
    entry_pos: tuple[jax.Array, ...],
    f_ptr: jax.Array,  # [S, C, rows_pad+1] chunk-local mask row pointers
    f_idx: jax.Array,  # [S, C, f_pad] mask indices (canonical, fill n_cols)
    *,
    mesh: Mesh,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
):
    """Masked counting SPMD step with the sliced-ELL expansion — the ELL
    form of :func:`dist_masked_spgemm_counts_sharded` (per-mask-entry
    common-neighbor counts when F = A = B, SPMD)."""
    from ..ops.counts import masked_counts_compress

    n_chunks = entry_rows[0].shape[1] if widths else 1
    fill = sort_pad - sum(p * w for p, w in zip(pads, widths))

    def shard_fn(tables, entry_rows, entry_pos, f_ptr, f_idx):
        f_pad = f_idx.shape[-1]
        outs = []
        for c in range(n_chunks):
            row, col = _ell_expand_chunk(
                tables, entry_rows, entry_pos, c, rows_pad, n_cols, fill
            )
            p, i, k, n = masked_counts_compress(
                row, col, f_ptr[0, c], f_idx[0, c], f_ptr[0, c][-1],
                rows_pad, n_cols,
            )
            outs.append((p, i[:f_pad], k[:f_pad], n))
        return _two_level_ptr_fix_counts(outs)

    n_classes = len(widths)
    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            (P(),) * n_classes,
            (P(ROWS_AXIS),) * n_classes,
            (P(ROWS_AXIS),) * n_classes,
            P(ROWS_AXIS),
            P(ROWS_AXIS),
        ),
        out_specs=(
            P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(),
        ),
    )(tables, entry_rows, entry_pos, f_ptr, f_idx)


def dist_spgemm_counts(
    a: BCSR,
    b: BCSR,
    mesh: Mesh | None = None,
    *,
    balance: str = "flops",
    engine: str = "auto",
) -> tuple[BCSR, np.ndarray]:
    """Multi-chip counting multiply C = A·B with per-entry multiplicities
    (the integer product of 0/1 matrices, SPMD): the counting form of
    :func:`dist_spgemm` (B replicated — the reference's semantics).
    Returns ``(c, counts)``; ``engine`` as in :func:`dist_spgemm`."""
    if a.n_cols != b.n_rows:
        raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
    if engine not in ("auto", "esc", "ell"):
        raise ValueError(f"unknown engine {engine!r}")
    from ..ops.spgemm import require_int32_operands

    require_int32_operands(a, b)
    n, m = a.n_rows, b.n_cols
    if a.nnz == 0 or b.nnz == 0:
        empty = BCSR(np.zeros(n + 1, np.int32), np.zeros(0, np.int32), (n, m))
        return empty, np.zeros(0, np.int64)
    # duplicate operand entries would inflate multiplicities
    a, b = a.sum_duplicates(), b.sum_duplicates()

    if engine in ("auto", "ell"):
        from ..ops.ell import AUTO_ELL_MAX_SLOTS

        mesh_ = mesh if mesh is not None else make_row_mesh()
        rf = row_flops(a, b)
        bounds = partition_rows(rf, mesh_.devices.size, balance=balance)
        try:
            (tables, er, ep, widths, pads, rows_pad, sort_pad, sub_bounds,
             _) = _shard_ell_operands(a, b, mesh_, bounds, rf)
            fits = sort_pad <= AUTO_ELL_MAX_SLOTS
        except OverflowError:
            if engine == "ell":
                raise
            fits = False
        if fits or engine == "ell":
            c_ptr, c_idx, c_cnt, nnz_sc, total = dist_spgemm_counts_ell(
                tables, er, ep,
                mesh=mesh_, rows_pad=rows_pad, n_cols=m,
                widths=widths, pads=pads, sort_pad=sort_pad,
            )
            return _assemble_subchunked(
                c_ptr, c_idx, nnz_sc, total, sub_bounds, (n, m), c_cnt=c_cnt
            )

    ops = shard_operands(a, b, mesh, balance=balance)
    c_ptr, c_idx, c_cnt, nnz_sh, total = dist_spgemm_counts_sharded(
        ops.a_ptr, ops.a_idx, ops.a_nnz, ops.b_ptr, ops.b_idx,
        mesh=ops.mesh, n_cols=m, flops_pad=ops.flops_pad,
    )
    return _assemble_sharded(
        c_ptr, c_idx, nnz_sh, total, ops.bounds, (n, m), c_cnt=c_cnt
    )


def dist_masked_spgemm_counts(
    f: BCSR,
    a: BCSR,
    b: BCSR,
    mesh: Mesh | None = None,
    *,
    balance: str = "flops",
    engine: str = "auto",
) -> tuple[BCSR, np.ndarray]:
    """Multi-chip masked counting multiply C = F .* (A·B) with
    multiplicities — the SPMD form of
    :func:`..ops.counts.masked_spgemm_counts` (per-edge common-neighbor
    counts when f = a = b).  MASK FIRST; returns ``(c, counts)``."""
    if a.n_cols != b.n_rows or tuple(f.shape) != (a.n_rows, b.n_cols):
        raise ValueError(f"shape mismatch: F{f.shape} vs {a.shape} @ {b.shape}")
    if engine not in ("auto", "esc", "ell"):
        raise ValueError(f"unknown engine {engine!r}")
    from ..ops.spgemm import require_int32_operands

    require_int32_operands(f, a, b)
    n, m = a.n_rows, b.n_cols
    if a.nnz == 0 or b.nnz == 0 or f.nnz == 0:
        empty = BCSR(np.zeros(n + 1, np.int32), np.zeros(0, np.int32), (n, m))
        return empty, np.zeros(0, np.int64)
    f = f.sum_duplicates()
    a, b = a.sum_duplicates(), b.sum_duplicates()

    if engine in ("auto", "ell"):
        from ..ops.ell import AUTO_ELL_MAX_SLOTS

        mesh_ = mesh if mesh is not None else make_row_mesh()
        rf = row_flops(a, b)
        bounds = partition_rows(rf, mesh_.devices.size, balance=balance)
        try:
            (tables, er, ep, widths, pads, rows_pad, sort_pad, sub_bounds,
             _) = _shard_ell_operands(
                a, b, mesh_, bounds, rf, extra_key_bits=1
            )
            fits = sort_pad <= AUTO_ELL_MAX_SLOTS
        except OverflowError:
            if engine == "ell":
                raise
            fits = False
        if fits or engine == "ell":
            f_ptr, f_idx = _shard_ell_csr(f, sub_bounds, rows_pad, mesh_)
            c_ptr, c_idx, c_cnt, nnz_sc, total = dist_masked_spgemm_counts_ell(
                tables, er, ep, f_ptr, f_idx,
                mesh=mesh_, rows_pad=rows_pad, n_cols=m,
                widths=widths, pads=pads, sort_pad=sort_pad,
            )
            return _assemble_subchunked(
                c_ptr, c_idx, nnz_sc, total, sub_bounds, (n, m), c_cnt=c_cnt
            )

    ops = shard_operands(a, b, mesh, balance=balance)
    f_ptr, f_idx, _ = _shard_rows_csr(f, ops.bounds, ops.rows_pad, ops.mesh)
    c_ptr, c_idx, c_cnt, nnz_sh, total = dist_masked_spgemm_counts_sharded(
        ops.a_ptr, ops.a_idx, ops.a_nnz, f_ptr, f_idx, ops.b_ptr, ops.b_idx,
        mesh=ops.mesh, n_cols=m, flops_pad=ops.flops_pad,
    )
    return _assemble_sharded(
        c_ptr, c_idx, nnz_sh, total, ops.bounds, (n, m), c_cnt=c_cnt
    )


@functools.partial(jax.jit, static_argnames=("mesh", "n_cols"))
def dist_spm_or_sharded(
    a_ptr, a_idx, a_nnz, b_ptr, b_idx, b_nnz, *, mesh: Mesh, n_cols: int
):
    """SPMD row union C = A OR B: both operands row-sharded by the same
    bounds, per-shard sort-union (``spm_or_padded``), shared assembly."""
    from ..ops.union import spm_or_padded

    def shard_fn(ap, ai, an, bp, bi, bn):
        c_ptr, c_idx, nnz_c = spm_or_padded(
            ap[0], ai[0], an[0, 0], bp[0], bi[0], bn[0, 0], n_cols=n_cols
        )
        return _assembly_epilogue(c_ptr, c_idx, nnz_c)

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS),) * 6,
        out_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P()),
    )(a_ptr, a_idx, a_nnz, b_ptr, b_idx, b_nnz)


def dist_spm_or(a: BCSR, b: BCSR, mesh: Mesh | None = None) -> BCSR:
    """Multi-chip C = A OR B (≡ SpM_OR, old/utils.c:488-504, under the row
    partition): rows split by combined nnz, both operands sharded — no
    replication at all, the cheapest possible SPMD op."""
    if tuple(a.shape) != tuple(b.shape):
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    from ..ops.spgemm import require_int32_operands

    require_int32_operands(a, b)
    n, m = a.shape
    mesh_ = mesh if mesh is not None else make_row_mesh()
    weights = (
        np.diff(a.indptr).astype(np.int64) + np.diff(b.indptr) + 1
    )
    bounds = partition_rows(weights, mesh_.devices.size, balance="flops")
    rows_pad = pad_bucket(int(np.max(np.diff(bounds))) or 1, minimum=1)
    a_ptr, a_idx, a_nnz = _shard_rows_csr(a, bounds, rows_pad, mesh_)
    b_ptr, b_idx, b_nnz = _shard_rows_csr(b, bounds, rows_pad, mesh_)
    c_ptr, c_idx, nnz_sh, total = dist_spm_or_sharded(
        a_ptr, a_idx, a_nnz, b_ptr, b_idx, b_nnz, mesh=mesh_, n_cols=m
    )
    return _assemble_sharded(c_ptr, c_idx, nnz_sh, total, bounds, (n, m))


@functools.partial(
    jax.jit, static_argnames=("mesh", "n_cols", "flops_pad", "masked")
)
def dist_spgemm_or_sharded(
    d_ptr, d_idx, d_nnz,
    a_ptr, a_idx, a_nnz,
    b_ptr, b_idx,
    f_ptr, f_idx,
    *,
    mesh: Mesh,
    n_cols: int,
    flops_pad: int,
    masked: bool,
):
    """SPMD fused C = D OR (F.*?(A·B)): D (and F) row-shard with A, B
    replicated, the tagged sort-join runs per shard (``spgemm_or_padded``),
    shared assembly.  ≡ the accumulate step of the reference's archived
    blocked designs (SpGEMM_dor*, old/BSpGEMM.c:75-254) at cluster scale."""
    from ..ops.fused import spgemm_or_padded

    def shard_fn(dp, di, dn, ap, ai, an, bp, bi, fp, fi):
        c_ptr, c_idx, nnz_c = spgemm_or_padded(
            dp[0], di[0], dn[0, 0], ap[0], ai[0], an[0, 0], bp, bi,
            fp[0] if masked else None,
            fi[0] if masked else None,
            n_cols=n_cols, flops_pad=flops_pad,
        )
        return _assembly_epilogue(c_ptr, c_idx, nnz_c)

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            (P(ROWS_AXIS),) * 3
            + (P(ROWS_AXIS),) * 3
            + (P(), P())
            + (P(ROWS_AXIS),) * 2
        ),
        out_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P()),
    )(d_ptr, d_idx, d_nnz, a_ptr, a_idx, a_nnz, b_ptr, b_idx, f_ptr, f_idx)


def dist_spgemm_or(
    d: BCSR,
    a: BCSR,
    b: BCSR,
    mesh: Mesh | None = None,
    *,
    mask: BCSR | None = None,
    balance: str = "flops",
    engine: str = "auto",
) -> BCSR:
    """Multi-chip fused C = D OR (A·B), optionally D OR (mask .* (A·B)).

    The distributed form of :func:`binary_spgemm_tpu.ops.fused.spgemm_or`
    (≡ SpGEMM_dor / SpGEMM_dor_masked, old/BSpGEMM.c:75-254, which the
    reference only ever ran single-threaded).

    ``engine``: like :func:`dist_spgemm` — ``"auto"`` takes the sliced-ELL
    per-shard expansion when it fits, ``"esc"``/``"ell"`` force."""
    if a.n_cols != b.n_rows or tuple(d.shape) != (a.n_rows, b.n_cols):
        raise ValueError(f"shape mismatch: D{d.shape} vs {a.shape} @ {b.shape}")
    if engine not in ("auto", "esc", "ell"):
        raise ValueError(f"unknown engine {engine!r}")
    from ..ops.spgemm import require_int32_operands

    require_int32_operands(d, a, b)
    n, m = a.n_rows, b.n_cols
    if a.nnz == 0 or b.nnz == 0:
        from ..ops.union import spm_or

        empty = BCSR(np.zeros(n + 1, np.int32), np.zeros(0, np.int32), (n, m))
        return spm_or(d, empty)
    if mask is not None:
        if tuple(mask.shape) != (n, m):
            raise ValueError(f"mask shape {mask.shape} != {(n, m)}")
        require_int32_operands(mask)
        mask = mask.sum_duplicates()
    d = d.sum_duplicates()

    if engine in ("auto", "ell"):
        from ..ops.ell import AUTO_ELL_MAX_SLOTS

        mesh_ = mesh if mesh is not None else make_row_mesh()
        rf = row_flops(a, b)
        bounds = partition_rows(rf, mesh_.devices.size, balance=balance)
        try:
            (tables, er, ep, widths, pads, rows_pad, sort_pad, sub_bounds,
             _) = _shard_ell_operands(
                a, b, mesh_, bounds, rf,
                extra_key_bits=2 if mask is not None else 0,
            )
            fits = sort_pad <= AUTO_ELL_MAX_SLOTS
        except OverflowError:
            if engine == "ell":
                raise
            fits = False
        if fits or engine == "ell":
            d_ptr, d_idx = _shard_ell_csr(d, sub_bounds, rows_pad, mesh_)
            f_src = mask if mask is not None else BCSR(
                np.zeros(n + 1, np.int32), np.zeros(0, np.int32), (n, m)
            )
            f_ptr, f_idx = _shard_ell_csr(f_src, sub_bounds, rows_pad, mesh_)
            c_ptr, c_idx, nnz_sc, total = dist_spgemm_or_ell(
                tables, er, ep, d_ptr, d_idx, f_ptr, f_idx,
                mesh=mesh_, rows_pad=rows_pad, n_cols=m,
                widths=widths, pads=pads, sort_pad=sort_pad,
                masked=mask is not None,
            )
            return _assemble_subchunked(
                c_ptr, c_idx, nnz_sc, total, sub_bounds, (n, m)
            )

    ops = shard_operands(a, b, mesh, balance=balance)
    d_ptr, d_idx, d_nnz = _shard_rows_csr(d, ops.bounds, ops.rows_pad, ops.mesh)
    f_src = mask if mask is not None else BCSR(
        np.zeros(n + 1, np.int32), np.zeros(0, np.int32), (n, m)
    )
    f_ptr, f_idx, _ = _shard_rows_csr(f_src, ops.bounds, ops.rows_pad, ops.mesh)
    c_ptr, c_idx, nnz_sh, total = dist_spgemm_or_sharded(
        d_ptr, d_idx, d_nnz,
        ops.a_ptr, ops.a_idx, ops.a_nnz,
        ops.b_ptr, ops.b_idx,
        f_ptr, f_idx,
        mesh=ops.mesh, n_cols=m, flops_pad=ops.flops_pad,
        masked=mask is not None,
    )
    return _assemble_sharded(c_ptr, c_idx, nnz_sh, total, ops.bounds, (n, m))


def shard_b_operands(
    b: BCSR, mesh: Mesh
) -> tuple[jax.Array, jax.Array, int]:
    """Row-shard B across the mesh: stacked shard-local row pointers
    ``[S, m_per+1]`` and padded indices ``[S, b_pad]`` (trailing shard rows
    beyond ``m`` are empty).  Returns ``(b_ptr_sh, b_idx_sh, m_per)``.
    """
    n_shards = mesh.devices.size
    m = b.n_rows
    m_per = -(-m // n_shards)
    b_pad = pad_bucket(
        max(
            int(b.indptr[min((s + 1) * m_per, m)] - b.indptr[min(s * m_per, m)])
            for s in range(n_shards)
        ),
        minimum=1,
    )
    if n_shards * b_pad > np.iinfo(np.int32).max:
        # the gathered layout addresses b_idx with int32 shard_base offsets
        raise OverflowError(
            f"gathered B layout {n_shards}x{b_pad} exceeds int32 addressing"
        )
    ptrs = np.zeros((n_shards, m_per + 1), np.int32)
    idxs = np.zeros((n_shards, b_pad), np.int32)
    for s in range(n_shards):
        r0, r1 = min(s * m_per, m), min((s + 1) * m_per, m)
        nnz_local = int(b.indptr[r1] - b.indptr[r0])
        ptrs[s, : r1 - r0 + 1] = b.indptr[r0 : r1 + 1] - b.indptr[r0]
        ptrs[s, r1 - r0 + 1 :] = nnz_local
        idxs[s, :nnz_local] = b.indices[b.indptr[r0] : b.indptr[r1]]
    shard = NamedSharding(mesh, P(ROWS_AXIS))
    return (
        jax.device_put(ptrs, shard),
        jax.device_put(idxs, shard),
        m_per,
    )


@functools.partial(
    jax.jit, static_argnames=("mesh", "n_cols", "flops_pad")
)
def dist_spgemm_sharded_b(
    a_ptr: jax.Array,
    a_idx: jax.Array,
    a_nnz: jax.Array,
    b_ptr_sh: jax.Array,  # [S, m_per+1] shard-local B row pointers (sharded)
    b_idx_sh: jax.Array,  # [S, b_pad]   shard-local B indices (sharded)
    *,
    mesh: Mesh,
    n_cols: int,
    flops_pad: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """SPMD step with **B row-sharded** instead of replicated.

    Each shard all-gathers B's index shards over ICI and addresses the gathered
    (gap-padded) layout via generalized row starts/lengths — the memory-scalable
    improvement over the reference's every-rank-reads-everything ingest
    (final/SpGEMM_mpi_omp.c:309): per-device B memory is nnz(B)/S until the
    gather, and the gather is an XLA collective riding ICI, not a file re-read.
    """

    def shard_fn(a_ptr, a_idx, a_nnz, b_ptr, b_idx):
        b_pad = b_idx.shape[1]
        m_per = b_ptr.shape[1] - 1
        g_idx = jax.lax.all_gather(b_idx[0], ROWS_AXIS)  # [S, b_pad]
        g_ptr = jax.lax.all_gather(b_ptr[0], ROWS_AXIS)  # [S, m_per+1]
        n_sh = g_idx.shape[0]
        shard_base = (jnp.arange(n_sh, dtype=INT) * b_pad)[:, None]
        starts = (g_ptr[:, :-1] + shard_base).reshape(-1)  # [S*m_per]
        lens = (g_ptr[:, 1:] - g_ptr[:, :-1]).reshape(-1)
        b_flat = g_idx.reshape(-1)
        n_rows = a_ptr.shape[1] - 1
        row, col = expand_pairs(
            a_ptr[0], a_idx[0], a_nnz[0, 0], None, b_flat,
            n_cols=n_cols, flops_pad=flops_pad,
            b_row_starts=starts, b_row_lens=lens,
        )
        c_ptr, c_idx, nnz_c = sort_compress(row, col, n_rows, n_cols)
        return _assembly_epilogue(c_ptr, c_idx, nnz_c)

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS)),
        out_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P()),
    )(a_ptr, a_idx, a_nnz, b_ptr_sh, b_idx_sh)


def ring_step_pad(
    a: BCSR, b: BCSR, bounds: np.ndarray, m_per: int, n_shards: int
) -> int:
    """Uniform per-(shard, step) expansion pad for the ring schedule.

    Step t on shard s expands exactly the A-entries of shard s whose column
    lies in B-shard ``(s - t) mod S``'s row range; the pad is the max flop
    count over all (shard, B-shard) cells, bucket-rounded.
    """
    bl = np.diff(b.indptr).astype(np.int64)
    per_entry = bl[a.indices] if a.nnz else np.zeros(0, np.int64)
    rows = np.repeat(np.arange(a.n_rows), np.diff(a.indptr))
    shard_of = np.searchsorted(bounds, rows, side="right") - 1
    src_of = np.minimum(a.indices // m_per, n_shards - 1)
    cell = np.bincount(
        shard_of * n_shards + src_of,
        weights=per_entry,
        minlength=n_shards * n_shards,
    )
    step_max = int(cell.max()) if cell.size else 0
    if step_max > np.iinfo(np.int32).max:
        raise OverflowError(
            f"ring step flop count {step_max} exceeds int32"
        )
    return pad_bucket(step_max, minimum=8)


@functools.partial(
    jax.jit, static_argnames=("mesh", "n_cols", "m_per", "step_pad")
)
def dist_spgemm_ring(
    a_ptr: jax.Array,
    a_idx: jax.Array,
    a_nnz: jax.Array,
    b_ptr_sh: jax.Array,  # [S, m_per+1] shard-local B row pointers (sharded)
    b_idx_sh: jax.Array,  # [S, b_pad]   shard-local B indices (sharded)
    *,
    mesh: Mesh,
    n_cols: int,
    m_per: int,
    step_pad: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Ring-pipelined SPMD step: B stays sharded and **rotates** through the
    mesh via ``lax.ppermute`` while each shard expands candidates against the
    B shard it currently holds.

    This is the collective-matmul pattern applied to SpGEMM — the TPU-native
    fix for the two scaling gaps the reference measured and documented:

    * its every-rank-reads-everything ingest (final/SpGEMM_mpi_omp.c:309) —
      here per-device B memory stays ``O(nnz(B)/S)`` for the *whole* multiply
      (the all-gather variant, ``dist_spgemm_sharded_b``, pays full ``nnz(B)``
      after the gather);
    * its compute-then-communicate structure with zero overlap (report §3's
      multi-node slowdown) — here step t's expansion and the ppermute that
      fetches step t+1's shard are independent, so XLA's scheduler overlaps
      ICI transfer with compute.

    One sort/compress over the concatenated per-step candidates finishes the
    shard's rows; assembly matches ``dist_spgemm_sharded``.
    """
    n_shards = mesh.devices.size
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    flops_pad = step_pad * n_shards

    def shard_fn(a_ptr, a_idx, a_nnz, b_ptr, b_idx):
        me = jax.lax.axis_index(ROWS_AXIS)
        n_rows = a_ptr.shape[1] - 1
        # mark the per-shard candidate buffers as device-varying so the carry
        # types match inside fori_loop under shard_map
        row_buf = jax.lax.pcast(
            jnp.full((flops_pad,), n_rows, INT), (ROWS_AXIS,), to="varying"
        )
        col_buf = jax.lax.pcast(
            jnp.full((flops_pad,), n_cols, INT), (ROWS_AXIS,), to="varying"
        )

        def body(t, carry):
            b_ptr_h, b_idx_h, row_buf, col_buf = carry
            src = (me - t) % n_shards  # B shard currently held
            row, col = expand_pairs(
                a_ptr[0], a_idx[0], a_nnz[0, 0], None, b_idx_h,
                n_cols=n_cols, flops_pad=step_pad,
                b_row_starts=b_ptr_h[:-1],
                b_row_lens=b_ptr_h[1:] - b_ptr_h[:-1],
                b_col_base=src * m_per,
            )
            row_buf = jax.lax.dynamic_update_slice(row_buf, row, (t * step_pad,))
            col_buf = jax.lax.dynamic_update_slice(col_buf, col, (t * step_pad,))
            # pass the held shard to the right neighbour; receive from the left
            b_ptr_h = jax.lax.ppermute(b_ptr_h, ROWS_AXIS, perm)
            b_idx_h = jax.lax.ppermute(b_idx_h, ROWS_AXIS, perm)
            return b_ptr_h, b_idx_h, row_buf, col_buf

        _, _, row_buf, col_buf = jax.lax.fori_loop(
            0, n_shards, body, (b_ptr[0], b_idx[0], row_buf, col_buf)
        )
        c_ptr, c_idx, nnz_c = sort_compress(row_buf, col_buf, n_rows, n_cols)
        return _assembly_epilogue(c_ptr, c_idx, nnz_c)

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS)),
        out_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P()),
    )(a_ptr, a_idx, a_nnz, b_ptr_sh, b_idx_sh)


def _ring_ell_entries(
    a: BCSR,
    ell,
    bounds: np.ndarray,
    cls_cuts: list,
    m_per: int,
    rows_pad: int,
    n_shards: int,
):
    """Per-(A-shard, B-shard, class) entry arrays for the ELL ring schedule.

    Entry ``(row, col)`` of A is processed at the ring step where A-shard
    ``searchsorted(bounds, row)`` holds B-shard ``col // m_per``'s table
    slice; its position is shard-local within that slice.  Returns per-class
    ``entry_rows``/``entry_pos`` of shape ``[S, S, ent_pad_c]`` (dim 1 = the
    source B shard) plus the pads."""
    rows_g = np.repeat(
        np.arange(a.n_rows, dtype=np.int64), np.diff(a.indptr)
    )
    cols = a.indices.astype(np.int64)
    ci_e = ell.class_of_row[cols]
    pos_e = ell.pos_in_class[cols].astype(np.int64)
    src_e = cols // m_per
    shard_e = np.searchsorted(bounds, rows_g, side="right") - 1
    er, ep, ent_pads = [], [], []
    for ci in range(len(ell.widths)):
        sel = ci_e == ci
        r, p, sde, srce = rows_g[sel], pos_e[sel], shard_e[sel], src_e[sel]
        lp = p - cls_cuts[ci][srce]  # slice-local table position
        key = sde * n_shards + srce
        cnt = np.bincount(key, minlength=n_shards * n_shards)
        pad = pad_bucket(int(cnt.max()) if len(r) else 1, minimum=8)
        order = np.argsort(key, kind="stable")
        starts = np.cumsum(cnt) - cnt
        cell_pos = np.arange(len(r)) - np.repeat(starts, cnt)
        er_c = np.full((n_shards, n_shards, pad), rows_pad, np.int32)
        ep_c = np.zeros((n_shards, n_shards, pad), np.int32)
        ko = key[order]
        er_c[ko // n_shards, ko % n_shards, cell_pos] = (
            r[order] - bounds[ko // n_shards]
        ).astype(np.int32)
        ep_c[ko // n_shards, ko % n_shards, cell_pos] = lp[order].astype(
            np.int32
        )
        er.append(er_c)
        ep.append(ep_c)
        ent_pads.append(pad)
    return er, ep, tuple(ent_pads)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "rows_pad", "n_cols", "widths", "ent_pads", "step_pad"
    ),
)
def dist_spgemm_ring_ell(
    tables_sh: tuple[jax.Array, ...],  # [S, tbl_pad_c, w] table slices (sharded)
    entry_rows: tuple[jax.Array, ...],  # [S, S, ent_pad_c] (dim 1 = src B shard)
    entry_pos: tuple[jax.Array, ...],  # [S, S, ent_pad_c] slice-local positions
    *,
    mesh: Mesh,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    ent_pads: tuple[int, ...],
    step_pad: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Ring-pipelined SPMD step with the **sliced-ELL expansion**: B's class
    tables stay sharded by B-row range and rotate through the mesh via
    ``lax.ppermute`` while each shard row-gathers the A-entries whose column
    falls in the currently-held slice.

    Combines :func:`dist_spgemm_ring`'s memory/overlap profile (per-device B
    stays ``O(nnz(B)/S)`` for the whole multiply; step t's gathers overlap
    the ppermute fetching step t+1's slice) with the ELL engine's row-gather
    expansion (~6x cheaper than the ESC element gather,
    benchmarks/micro.jsonl) — the ring previously only existed over ESC.
    One sort/compress over the concatenated per-step candidates finishes the
    shard's rows; assembly matches :func:`dist_spgemm_sharded`.
    """
    from ..ops.ell import _expand_class

    n_shards = mesh.devices.size
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    flops_pad = step_pad * n_shards
    n_classes = len(widths)

    def shard_fn(tables, entry_rows, entry_pos):
        me = jax.lax.axis_index(ROWS_AXIS)
        row_buf = jax.lax.pcast(
            jnp.full((flops_pad,), rows_pad, INT), (ROWS_AXIS,), to="varying"
        )
        col_buf = jax.lax.pcast(
            jnp.full((flops_pad,), n_cols, INT), (ROWS_AXIS,), to="varying"
        )
        held = tuple(t[0] for t in tables)  # this shard's slice at step 0

        def body(t, carry):
            held, row_buf, col_buf = carry
            src = (me - t) % n_shards  # B shard currently held
            parts_r, parts_c = [], []
            for ci in range(n_classes):
                er_t = jax.lax.dynamic_slice(
                    entry_rows[ci][0], (src, 0), (1, ent_pads[ci])
                )[0]
                ep_t = jax.lax.dynamic_slice(
                    entry_pos[ci][0], (src, 0), (1, ent_pads[ci])
                )[0]
                r, c = _expand_class(held[ci], er_t, ep_t, rows_pad, n_cols)
                parts_r.append(r)
                parts_c.append(c)
            row = jnp.concatenate(parts_r)
            col = jnp.concatenate(parts_c)
            row_buf = jax.lax.dynamic_update_slice(row_buf, row, (t * step_pad,))
            col_buf = jax.lax.dynamic_update_slice(col_buf, col, (t * step_pad,))
            # pass the held slices to the right neighbour; receive from left
            held = tuple(
                jax.lax.ppermute(h, ROWS_AXIS, perm) for h in held
            )
            return held, row_buf, col_buf

        _, row_buf, col_buf = jax.lax.fori_loop(
            0, n_shards, body, (held, row_buf, col_buf)
        )
        c_ptr, c_idx, nnz_c = sort_compress(row_buf, col_buf, rows_pad, n_cols)
        return _assembly_epilogue(c_ptr, c_idx, nnz_c)

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            (P(ROWS_AXIS),) * n_classes,
            (P(ROWS_AXIS),) * n_classes,
            (P(ROWS_AXIS),) * n_classes,
        ),
        out_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P()),
    )(tables_sh, entry_rows, entry_pos)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
        "gather_tables", "batched",
    ),
)
def dist_spgemm_ell(
    tables: tuple[jax.Array, ...],  # [nc, w] replicated ELL class tables
    entry_rows: tuple[jax.Array, ...],  # [S, pad_c] shard-local row ids (sharded)
    entry_pos: tuple[jax.Array, ...],  # [S, pad_c] in-class B-row slots (sharded)
    *,
    mesh: Mesh,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
    gather_tables: bool = False,
    batched: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """SPMD step with the **sliced-ELL expansion** per shard (see ops/ell.py):
    each shard row-gathers its A-entries' B rows and runs the same
    sub-chunked sort plan as the single-chip executor — chunk-local row ids
    pack the sort key into one int32 when ``rows_pad``/``n_cols`` allow, and
    unrolled chunks overlap.  Entry arrays are ``[S, C, pad_c]`` (chunk dim C
    static).  Row pointers come back globally prefix-fixed across both
    chunks and shards.

    ``gather_tables=False``: class tables are replicated (the reference's
    every-rank-holds-B semantics).  ``gather_tables=True``: tables arrive
    sharded by B-row range (``[S, tbl_pad_c, w]``, from
    :func:`_shard_b_ell_tables`) and are all-gathered over ICI inside the
    step; entry positions were host-remapped into the gap-padded gathered
    layout, so expansion is otherwise identical.  Per-device B memory is
    ``O(nnz(B)/S)`` until the gather.

    ``batched=True`` (set by ``_shard_ell_operands(allow_batched=True)`` for
    big per-shard row counts): all C sub-chunk streams stack into one
    ``[C, sort_pad]`` array and the sorts run along axis -1
    (``sort_compress_2d``) — the SPMD form of the single-chip batched 2-D
    engine, keeping the packed row cap at any shard size.
    """
    n_chunks = entry_rows[0].shape[1] if widths else 1
    fill = sort_pad - sum(p * w for p, w in zip(pads, widths))

    def shard_fn(tables, entry_rows, entry_pos):
        from ..ops.ell import _expand_class_2d
        from ..ops.spgemm import (
            packable, sort_compress_2d, sort_compress_2d_keys,
        )

        if gather_tables:
            # [1, tbl_pad, w] shard -> [S*tbl_pad, w] gap-padded full table
            tables = tuple(
                jax.lax.all_gather(t[0], ROWS_AXIS).reshape(-1, t.shape[-1])
                for t in tables
            )
        if batched and packable(rows_pad, n_cols):
            # Direct packed-key sub-chunk streams, VECTORIZED over the
            # sub-chunk axis (ab="key-stream"): the staged [C, pad_c] entry
            # arrays feed one batched gather per class — the SPMD form of
            # `ops/ell.py::_assemble_stream_2d(shift=...)`.  The earlier
            # per-chunk python loop emitted C unrolled expansion graphs,
            # which at production scale (1M rows / 1024 packed sub-chunks)
            # exploded XLA compile time (>45 min on the CPU mesh; the same
            # blowup would hit this environment's remote-compile tunnel).
            bl = int(n_cols).bit_length()
            parts = [
                _expand_class_2d(t, e[0], p[0], rows_pad, n_cols, shift=bl)
                for t, e, p in zip(tables, entry_rows, entry_pos)
            ]
            if fill:
                sent = jnp.full(
                    (n_chunks, fill), (rows_pad << bl) | n_cols, INT
                )
                parts.append(
                    jax.lax.pcast(sent, (ROWS_AXIS,), to="varying")
                )
            keys = jnp.concatenate(parts, axis=1)
            ptr2, idx2, nnz2 = sort_compress_2d_keys(keys, rows_pad, n_cols)
            return _two_level_ptr_fix_stacked(ptr2, idx2, nnz2)
        streams = [
            _ell_expand_chunk(
                tables, entry_rows, entry_pos, c, rows_pad, n_cols, fill
            )
            for c in range(n_chunks)
        ]
        if batched:
            ptr2, idx2, nnz2 = sort_compress_2d(
                jnp.stack([r for r, _ in streams]),
                jnp.stack([c for _, c in streams]),
                rows_pad, n_cols,
            )
            return _two_level_ptr_fix_stacked(ptr2, idx2, nnz2)
        outs = [
            sort_compress(row, col, rows_pad, n_cols)
            for row, col in streams
        ]
        return _two_level_ptr_fix(outs)

    n_classes = len(widths)
    tbl_spec = P(ROWS_AXIS) if gather_tables else P()
    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            (tbl_spec,) * n_classes,
            (P(ROWS_AXIS),) * n_classes,
            (P(ROWS_AXIS),) * n_classes,
        ),
        out_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P()),
    )(tables, entry_rows, entry_pos)


def _ell_expand_chunk(
    tables, entry_rows, entry_pos, c: int, rows_pad: int, n_cols: int,
    fill: int,
):
    """Expand one sub-chunk's candidate stream from the ELL class tables
    (inside shard_map): per-class row-gather expansion plus ``fill``
    sentinel pairs so every chunk shares the static ``sort_pad`` length.
    (The batched SPMD branch does NOT use this per-chunk form — it expands
    all sub-chunks at once as packed keys; see ``dist_spgemm_ell``.)"""
    from ..ops.ell import _expand_class

    parts_r, parts_c = [], []
    for t, er, ep in zip(tables, entry_rows, entry_pos):
        r, cc = _expand_class(t, er[0, c], ep[0, c], rows_pad, n_cols)
        parts_r.append(r)
        parts_c.append(cc)
    if fill:
        sent_r = jnp.full((fill,), rows_pad, INT)
        sent_c = jnp.full((fill,), n_cols, INT)
        parts_r.append(jax.lax.pcast(sent_r, (ROWS_AXIS,), to="varying"))
        parts_c.append(jax.lax.pcast(sent_c, (ROWS_AXIS,), to="varying"))
    return jnp.concatenate(parts_r), jnp.concatenate(parts_c)


def _two_level_ptr_fix(outs):
    """Stack per-chunk (ptr, idx, nnz) and apply the two-level pointer fix
    (chunk prefix within the shard + shard offset over the mesh; ≡ the
    reference's intra-rank stitch :134-141 + root cross-rank fix :211-223).
    Runs inside shard_map; returns the per-shard outputs plus the global
    total."""
    return _two_level_ptr_fix_stacked(
        jnp.stack([o[0] for o in outs]),
        jnp.stack([o[1] for o in outs]),
        jnp.stack([o[2] for o in outs]),
    )


def _two_level_ptr_fix_stacked(ptr, idx, nnzs):
    """:func:`_two_level_ptr_fix` on already-stacked ``[C, ·]`` chunk
    outputs (the batched 2-D SPMD path produces them stacked natively)."""
    local_off = jnp.cumsum(nnzs) - nnzs
    shard_total = jnp.sum(nnzs, dtype=INT)
    total = jax.lax.psum(shard_total, ROWS_AXIS)
    counts = jax.lax.all_gather(shard_total, ROWS_AXIS)
    me = jax.lax.axis_index(ROWS_AXIS)
    shard_off = jnp.sum(
        jnp.where(jnp.arange(counts.shape[0], dtype=INT) < me, counts, 0),
        dtype=INT,
    )
    ptr = ptr + (local_off + shard_off)[:, None]
    return ptr[None], idx[None], nnzs[None], total


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "rows_pad", "n_cols", "widths", "pads", "sort_pad"),
)
def dist_masked_spgemm_ell(
    tables: tuple[jax.Array, ...],  # [nc, w] replicated ELL class tables
    entry_rows: tuple[jax.Array, ...],  # [S, C, pad_c] (sharded)
    entry_pos: tuple[jax.Array, ...],
    f_ptr: jax.Array,  # [S, C, rows_pad+1] chunk-local mask row pointers
    f_idx: jax.Array,  # [S, C, f_pad] mask indices (canonical, fill n_cols)
    *,
    mesh: Mesh,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Masked SPMD step with the sliced-ELL expansion: the per-shard
    sub-chunked plan of :func:`dist_spgemm_ell` with the sort-fused mask
    join (``sort_compress_masked``) replacing the plain compress — the ELL
    form of :func:`dist_masked_spgemm_sharded` (~4× cheaper expansion,
    ops/ell.py's measured single-chip gap)."""
    from ..ops.spgemm import _row_ids, sort_compress_masked

    n_chunks = entry_rows[0].shape[1] if widths else 1
    fill = sort_pad - sum(p * w for p, w in zip(pads, widths))

    def shard_fn(tables, entry_rows, entry_pos, f_ptr, f_idx):
        outs = []
        for c in range(n_chunks):
            row, col = _ell_expand_chunk(
                tables, entry_rows, entry_pos, c, rows_pad, n_cols, fill
            )
            f_rows = _row_ids(f_ptr[0, c], f_idx.shape[-1])
            outs.append(
                sort_compress_masked(
                    row, col, f_rows, f_idx[0, c], f_ptr[0, c][-1],
                    rows_pad, n_cols,
                )
            )
        return _two_level_ptr_fix(outs)

    n_classes = len(widths)
    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            (P(),) * n_classes,
            (P(ROWS_AXIS),) * n_classes,
            (P(ROWS_AXIS),) * n_classes,
            P(ROWS_AXIS),
            P(ROWS_AXIS),
        ),
        out_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P()),
    )(tables, entry_rows, entry_pos, f_ptr, f_idx)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "rows_pad", "n_cols", "widths", "pads", "sort_pad", "masked",
    ),
)
def dist_spgemm_or_ell(
    tables: tuple[jax.Array, ...],  # [nc, w] replicated ELL class tables
    entry_rows: tuple[jax.Array, ...],  # [S, C, pad_c] (sharded)
    entry_pos: tuple[jax.Array, ...],
    d_ptr: jax.Array,  # [S, C, rows_pad+1] chunk-local D row pointers
    d_idx: jax.Array,  # [S, C, d_pad] D indices (canonical, fill n_cols)
    f_ptr: jax.Array,  # mask, same layout as D (ignored unless masked)
    f_idx: jax.Array,
    *,
    mesh: Mesh,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
    masked: bool,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused SPMD step C = D OR (F.*?(A·B)) with the sliced-ELL expansion:
    the sub-chunked plan of :func:`dist_spgemm_ell` where D's chunk-local
    pairs join each chunk's candidate stream before the sort (the SPA
    pre-seed analogue, ≡ SpGEMM_dor old/BSpGEMM.c:75-254); masked uses the
    three-way tagged join of ``spgemm_or_padded`` (mask < D < candidate) —
    the ELL form of :func:`dist_spgemm_or_sharded`."""
    from ..ops.fused import _sort_compress_or_masked
    from ..ops.spgemm import _row_ids

    n_chunks = entry_rows[0].shape[1] if widths else 1
    fill = sort_pad - sum(p * w for p, w in zip(pads, widths))

    def shard_fn(tables, entry_rows, entry_pos, d_ptr, d_idx, f_ptr, f_idx):
        outs = []
        for c in range(n_chunks):
            row, col = _ell_expand_chunk(
                tables, entry_rows, entry_pos, c, rows_pad, n_cols, fill
            )
            d_pad = d_idx.shape[-1]
            d_rows = _row_ids(d_ptr[0, c], d_pad)
            d_valid = jnp.arange(d_pad, dtype=INT) < d_ptr[0, c][-1]
            d_rows = jnp.where(d_valid, d_rows, rows_pad)
            d_cols = jnp.where(d_valid, d_idx[0, c], n_cols)
            if masked:
                f_pad = f_idx.shape[-1]
                f_rows = _row_ids(f_ptr[0, c], f_pad)
                f_valid = jnp.arange(f_pad, dtype=INT) < f_ptr[0, c][-1]
                f_rows = jnp.where(f_valid, f_rows, rows_pad)
                f_cols = jnp.where(f_valid, f_idx[0, c], n_cols)
                outs.append(
                    _sort_compress_or_masked(
                        row, col, d_rows, d_cols, f_rows, f_cols,
                        rows_pad, n_cols,
                    )
                )
            else:
                # D's pairs join the candidate stream; dedup is the union
                outs.append(
                    sort_compress(
                        jnp.concatenate([row, d_rows]),
                        jnp.concatenate([col, d_cols]),
                        rows_pad, n_cols,
                    )
                )
        return _two_level_ptr_fix(outs)

    n_classes = len(widths)
    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            (P(),) * n_classes,
            (P(ROWS_AXIS),) * n_classes,
            (P(ROWS_AXIS),) * n_classes,
            P(ROWS_AXIS),
            P(ROWS_AXIS),
            P(ROWS_AXIS),
            P(ROWS_AXIS),
        ),
        out_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P()),
    )(tables, entry_rows, entry_pos, d_ptr, d_idx, f_ptr, f_idx)


def _shard_ell_csr(
    f: BCSR, sub_bounds: np.ndarray, rows_pad: int, mesh: Mesh
):
    """Per-(shard, sub-chunk) padded chunk-local CSR arrays for a row-sharded
    side input (mask F, fused D): pointers ``[S, C, rows_pad+1]`` (trailing
    rows clamped to the chunk nnz) + indices ``[S, C, pad]`` (fill
    ``n_cols``)."""
    n_shards, C1 = sub_bounds.shape
    C = C1 - 1
    f_pad = pad_bucket(
        max(
            (
                int(f.indptr[sub_bounds[s, c + 1]] - f.indptr[sub_bounds[s, c]])
                for s in range(n_shards)
                for c in range(C)
            ),
            default=1,
        ),
        minimum=1,
    )
    ptrs = np.zeros((n_shards, C, rows_pad + 1), np.int32)
    idxs = np.full((n_shards, C, f_pad), f.n_cols, np.int32)
    for s in range(n_shards):
        for c in range(C):
            r0, r1 = int(sub_bounds[s, c]), int(sub_bounds[s, c + 1])
            nnz_local = int(f.indptr[r1] - f.indptr[r0])
            ptrs[s, c, : r1 - r0 + 1] = f.indptr[r0 : r1 + 1] - f.indptr[r0]
            ptrs[s, c, r1 - r0 + 1 :] = nnz_local
            idxs[s, c, :nnz_local] = f.indices[f.indptr[r0] : f.indptr[r1]]
    shard = NamedSharding(mesh, P(ROWS_AXIS))
    return jax.device_put(ptrs, shard), jax.device_put(idxs, shard)


def _shard_b_ell_tables(ell, mesh: Mesh):
    """Slice every ELL class table by B-row range into per-device shards.

    ``EllB.build`` assigns class slots in ascending B-row order, so B-shard
    ``j``'s rows of class ``c`` are the contiguous slice
    ``tables[c][cls_cuts[c][j]:cls_cuts[c][j+1]]``.  Returns stacked
    sentinel-padded shards ``[S, tbl_pad_c, w_c]`` per class plus the cut
    arrays needed to translate in-class positions to shard-local ones.
    Per-device table memory is ``O(nnz(B)/S)`` + class padding — the
    memory-scalable layout the reference lacks (every rank holds all of B,
    final/SpGEMM_mpi_omp.c:309).
    """
    n_shards = mesh.devices.size
    m = ell.shape[0]
    m_per = -(-m // n_shards) if m else 1
    edges = np.minimum(np.arange(n_shards + 1) * m_per, m)
    tbl_sh, tbl_pads, cls_cuts = [], [], []
    for ci, tbl in enumerate(ell.tables):
        class_rows = np.flatnonzero(ell.class_of_row == ci)
        cuts = np.searchsorted(class_rows, edges).astype(np.int64)
        cnt = np.diff(cuts)
        pad = pad_bucket(int(cnt.max()) if cnt.size else 1, minimum=1)
        st = np.full((n_shards, pad, tbl.shape[1]), ell.shape[1], np.int32)
        for s in range(n_shards):
            lo, hi = int(cuts[s]), int(cuts[s + 1])
            st[s, : hi - lo] = tbl[lo:hi]
        if n_shards * pad > np.iinfo(np.int32).max:
            raise OverflowError(
                f"sharded ELL table {n_shards}x{pad} exceeds int32 addressing"
            )
        tbl_sh.append(st)
        tbl_pads.append(pad)
        cls_cuts.append(cuts)
    return tbl_sh, tuple(tbl_pads), cls_cuts, m_per


def _balanced_chunk_bounds(
    rf: np.ndarray, budget: int, max_rows: int
) -> list[int]:
    """Flop-EQUALIZED sub-chunk boundaries for the SPMD per-shard plan.

    The single-chip greedy splitter (``ops/ell.py::_chunk_bounds``) fills
    each chunk to the budget and leaves the last chunk nearly empty — fine
    at large chunk counts, but a per-shard plan at 8 devices often lands at
    C=2 where the full-but-padded + empty-but-padded pair inflates padded
    work 2x and the per-shard sort_pad never shrinks with the mesh (VERDICT
    r03 missing #2: rows_pad/sort_pad constant at N=1..8).  This splitter
    takes the greedy plan's chunk COUNT, then re-cuts at equal
    cumulative-flop quantiles so every chunk (and therefore ``sort_pad``,
    the max) shrinks with the shard's flop share; oversized chunks (row cap)
    are split again.  Single-chip plans are untouched — their measured
    optima were tuned on the greedy splitter.
    """
    from ..ops.ell import _chunk_bounds

    greedy = _chunk_bounds(rf, budget, max_rows)
    C = len(greedy) - 1
    n = len(rf)
    if C <= 1:
        return greedy
    cum = np.concatenate([[0], np.cumsum(rf, dtype=np.int64)])
    total = int(cum[-1])
    if total <= 0:
        bounds = np.round(np.linspace(0, n, C + 1)).astype(np.int64)
    else:
        targets = (np.arange(1, C, dtype=np.int64) * total) // C
        cuts = np.searchsorted(cum, targets, side="left")
        bounds = np.concatenate([[0], cuts, [n]])
        bounds = np.maximum.accumulate(bounds)
    out = [0]
    for i in range(len(bounds) - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        while hi - lo > max_rows:  # row-cap guard (quantiles ignore rows)
            lo += max_rows
            out.append(lo)
        if hi > out[-1]:
            out.append(hi)
    if out[-1] != n:
        out.append(n)
    return out


def _shard_ell_operands(
    a: BCSR,
    b: BCSR,
    mesh: Mesh,
    bounds: np.ndarray,
    rf: np.ndarray,
    *,
    b_tables: str = "replicated",
    extra_key_bits: int = 0,
    allow_batched: bool = False,
):
    """Device-sharded per-(shard, chunk, class) ELL entry arrays + replicated
    tables.  Each shard's rows are sub-chunked exactly like the single-chip
    executor (flop-balanced, row-capped for packed sort keys); all shards
    share one static chunk count C (trailing chunks empty where a shard
    needed fewer).  Returns ``(..., sub_bounds [S, C+1], batched)`` for
    assembly.

    ``allow_batched``: when a shard would need more than 16 packed sub-chunks
    (big per-shard row counts — exactly the regime the single-chip batched
    2-D engine exists for), keep the packed row cap and flag ``batched`` so
    :func:`dist_spgemm_ell` serves all sub-chunks with ONE axis-(-1) 2-D
    sort (``sort_compress_2d``) instead of falling back to few unpacked
    chunks (2-key sorts, measured ~1.4-1.5x slower per element)."""
    from ..ops.ell import EllB, _build_class_entries

    n_shards = mesh.devices.size
    ell = EllB.build(b)
    rows_pc, pos_pc = _build_class_entries(a, ell)
    widths = tuple(ell.widths)
    n_cols = b.n_cols
    # tagged joins pack (row, col, tag) — the masked join spends 1 extra
    # key bit, the fused-masked three-way join 2, so the packed-sort row
    # cap halves per bit (≡ EllSpGEMMExecutor masked=True)
    shift = int(n_cols).bit_length() + extra_key_bits
    cap = 1 << max(0, 30 - shift)

    if b_tables == "sharded":
        # Tables sliced by B-row range (gathered in-step); in-class entry
        # positions remapped into the gap-padded gathered layout.  Class
        # slots ascend with B row, so a position's source shard is a
        # searchsorted against the class cut array.
        tbl_sh, tbl_pads, cls_cuts, _ = _shard_b_ell_tables(ell, mesh)
        remapped = []
        for ci, pcls in enumerate(pos_pc):
            p = pcls.astype(np.int64)
            src = np.searchsorted(cls_cuts[ci], p, side="right") - 1
            remapped.append(
                (src * tbl_pads[ci] + (p - cls_cuts[ci][src])).astype(np.int32)
            )
        pos_pc = remapped

    from ..ops.ell import BATCHED_MAX_SLOTS

    # Plan BEFORE any staging, with a pre-staging skew guard: the batched
    # form's resident [C, sort_pad] stream per shard must fit the same
    # bound the single-chip batched engine enforces (BATCHED_MAX_SLOTS) —
    # checking after the multi-GB device_puts would both waste the staging
    # and surface as an uncatchable XlaRuntimeError instead of the
    # unrolled re-plan.
    for attempt_batched in ((allow_batched, False) if allow_batched else (False,)):
        per_shard_bounds = []
        batched = False
        for s in range(n_shards):
            r0, r1 = int(bounds[s]), int(bounds[s + 1])
            rf_s = rf[r0:r1]
            sflops = int(rf_s.sum())
            budget = max(sflops // 8, 1 << 19)
            shard_rows = max(r1 - r0, 1)
            need_packed = -(-shard_rows // cap) if cap else shard_rows + 1
            if cap >= 512 and need_packed <= 16:
                max_rows = cap  # few packed sub-chunks: unrolled plan
            elif attempt_batched and cap >= 32 and 16 < need_packed <= 4096:
                # many packed sub-chunks: keep the cap, serve them with ONE
                # [C, sort_pad] axis-(-1) sort (the SPMD batched 2-D form)
                max_rows = cap
                batched = True
            else:
                max_rows = shard_rows  # unpacked 2-key sorts: keep C small
            sb = (
                _balanced_chunk_bounds(rf_s, budget, max_rows)
                if r1 > r0
                else [0, 0]
            )
            per_shard_bounds.append([r0 + x for x in sb])
        C = max(len(sb) - 1 for sb in per_shard_bounds)
        sub_bounds = np.zeros((n_shards, C + 1), np.int64)
        for s, sb in enumerate(per_shard_bounds):
            sub_bounds[s, : len(sb)] = sb
            sub_bounds[s, len(sb) :] = sb[-1]  # trailing empty chunks

        rows_pad = pad_bucket(
            int(np.max(np.diff(sub_bounds, axis=1))) or 1, minimum=1
        )
        cuts_pc = [
            np.stack([np.searchsorted(rcls, sub_bounds[s]) for s in range(n_shards)])
            for rcls in rows_pc
        ]  # per class: [S, C+1]
        pads = tuple(
            pad_bucket(max(int(np.diff(c, axis=1).max()), 1), minimum=8)
            for c in cuts_pc
        ) if widths else ()
        slots = sum(p * w for p, w in zip(pads, widths))
        sort_pad = pad_bucket(max(slots, 8))
        if batched and C * sort_pad > BATCHED_MAX_SLOTS:
            continue  # skew guard: re-plan unrolled
        break
    if slots > np.iinfo(np.int32).max:
        raise OverflowError(f"ELL shard expansion {slots} slots exceeds int32")
    shard = NamedSharding(mesh, P(ROWS_AXIS))
    repl = NamedSharding(mesh, P())
    if b_tables == "sharded":
        tables = tuple(jax.device_put(t, shard) for t in tbl_sh)
    else:
        tables = tuple(jax.device_put(t, repl) for t in ell.tables)
    er, ep = [], []
    for ci, (rcls, pcls, pad) in enumerate(zip(rows_pc, pos_pc, pads)):
        r = np.full((n_shards, C, pad), rows_pad, np.int32)
        p = np.zeros((n_shards, C, pad), np.int32)
        for s in range(n_shards):
            for c in range(C):
                lo, hi = cuts_pc[ci][s, c], cuts_pc[ci][s, c + 1]
                r[s, c, : hi - lo] = rcls[lo:hi] - sub_bounds[s, c]
                p[s, c, : hi - lo] = pcls[lo:hi]
        er.append(jax.device_put(r, shard))
        ep.append(jax.device_put(p, shard))
    return (
        tables, tuple(er), tuple(ep), widths, pads, rows_pad, sort_pad,
        sub_bounds, batched,
    )


def _shard_ring_ell_operands(a: BCSR, b: BCSR, mesh: Mesh, bounds: np.ndarray):
    """Device-ready operands for :func:`dist_spgemm_ring_ell`: sharded class
    table slices + per-(shard, source B shard, class) entry arrays."""
    from ..ops.ell import EllB

    n_shards = mesh.devices.size
    ell = EllB.build(b)
    widths = tuple(ell.widths)
    rows_pad = pad_bucket(int(np.max(np.diff(bounds))) or 1, minimum=1)
    tbl_sh, tbl_pads, cls_cuts, m_per = _shard_b_ell_tables(ell, mesh)
    er, ep, ent_pads = _ring_ell_entries(
        a, ell, bounds, cls_cuts, m_per, rows_pad, n_shards
    )
    step_pad = sum(p * w for p, w in zip(ent_pads, widths))
    if step_pad * n_shards > np.iinfo(np.int32).max:
        raise OverflowError(
            f"ring-ELL candidate buffer {step_pad * n_shards} slots "
            "exceeds int32"
        )
    shard = NamedSharding(mesh, P(ROWS_AXIS))
    tables = tuple(jax.device_put(t, shard) for t in tbl_sh)
    er = tuple(jax.device_put(e, shard) for e in er)
    ep = tuple(jax.device_put(e, shard) for e in ep)
    return tables, er, ep, widths, ent_pads, rows_pad, step_pad


def dist_spgemm(
    a: BCSR,
    b: BCSR,
    mesh: Mesh | None = None,
    *,
    balance: str = "flops",
    b_layout: str = "replicated",
    engine: str = "auto",
) -> BCSR:
    """Multi-chip C = A·B: shard, run the SPMD step, assemble on host.

    ``engine``: ``"auto"`` uses the sliced-ELL per-shard expansion whenever
    the padded expansion fits (``ops/ell.py``'s measured ~4x over ESC) and
    falls back to ESC; ``"esc"``/``"ell"`` force an engine.  Every
    ``b_layout`` has an ELL form: replicated tables, gathered table shards
    (``gather_tables``), or ring-rotated table slices
    (:func:`dist_spgemm_ring_ell`).

    ``b_layout``: ``"replicated"`` keeps the full B on every device (the
    reference's semantics); ``"sharded"`` row-shards B and all-gathers it
    inside the SPMD step (1/S device memory for B until the gather);
    ``"ring"`` row-shards B and rotates the shards through the mesh with
    ``ppermute`` overlapped with expansion (O(nnz(B)/S) device memory
    throughout — see :func:`dist_spgemm_ring`).

    The host assembly is the analogue of the reference's gather-to-root; on a
    real pod the sharded outputs can instead stay device-resident for further
    SPMD compute (composition the reference cannot express).
    """
    if a.n_cols != b.n_rows:
        raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
    if b_layout not in ("replicated", "sharded", "ring"):
        raise ValueError(f"unknown b_layout {b_layout!r}")
    if engine not in ("auto", "esc", "ell"):
        raise ValueError(f"unknown engine {engine!r}")
    from ..ops.spgemm import require_int32_operands

    require_int32_operands(a, b)
    n, m = a.n_rows, b.n_cols
    if a.nnz == 0 or b.nnz == 0:
        return BCSR(np.zeros(n + 1, np.int32), np.zeros(0, np.int32), (n, m))

    if engine in ("auto", "ell"):
        from ..ops.ell import AUTO_ELL_MAX_SLOTS

        mesh_ = mesh if mesh is not None else make_row_mesh()
        rf = row_flops(a, b)
        bounds = partition_rows(rf, mesh_.devices.size, balance=balance)
        if b_layout == "ring":
            try:
                (tables, er, ep, widths, ent_pads, rows_pad, step_pad) = (
                    _shard_ring_ell_operands(a, b, mesh_, bounds)
                )
                fits = (
                    bool(widths)
                    and step_pad * mesh_.devices.size <= AUTO_ELL_MAX_SLOTS
                )
            except OverflowError:
                if engine == "ell":
                    raise  # forced engine: surface the guard, don't mask it
                fits = False
            if fits or engine == "ell":
                c_ptr, c_idx, nnz_sh, total = dist_spgemm_ring_ell(
                    tables, er, ep,
                    mesh=mesh_, rows_pad=rows_pad, n_cols=m,
                    widths=widths, ent_pads=ent_pads, step_pad=step_pad,
                )
                return _assemble_sharded(
                    c_ptr, c_idx, nnz_sh, total, bounds, (n, m)
                )
        else:
            try:
                (tables, er, ep, widths, pads, rows_pad, sort_pad, sub_bounds,
                 batched) = _shard_ell_operands(
                    a, b, mesh_, bounds, rf, b_tables=b_layout,
                    allow_batched=True,
                )
                # batched plans are bounded inside _shard_ell_operands
                # (pre-staging BATCHED_MAX_SLOTS skew guard with an
                # unrolled re-plan), so only the per-chunk bound remains
                fits = sort_pad <= AUTO_ELL_MAX_SLOTS
            except OverflowError:
                if engine == "ell":
                    raise  # forced engine: surface the guard, don't mask it
                fits = False
            if fits or engine == "ell":
                c_ptr, c_idx, nnz_sc, total = dist_spgemm_ell(
                    tables, er, ep,
                    mesh=mesh_, rows_pad=rows_pad, n_cols=m,
                    widths=widths, pads=pads, sort_pad=sort_pad,
                    gather_tables=(b_layout == "sharded"),
                    batched=batched,
                )
                return _assemble_subchunked(
                    c_ptr, c_idx, nnz_sc, total, sub_bounds, (n, m)
                )

    ops = shard_operands(a, b, mesh, balance=balance)
    if b_layout == "ring":
        b_ptr_sh, b_idx_sh, m_per = shard_b_operands(b, ops.mesh)
        step_pad = ring_step_pad(
            a, b, ops.bounds, m_per, ops.mesh.devices.size
        )
        c_ptr, c_idx, nnz_sh, total = dist_spgemm_ring(
            ops.a_ptr, ops.a_idx, ops.a_nnz, b_ptr_sh, b_idx_sh,
            mesh=ops.mesh, n_cols=m, m_per=m_per, step_pad=step_pad,
        )
    elif b_layout == "sharded":
        b_ptr_sh, b_idx_sh, _ = shard_b_operands(b, ops.mesh)
        c_ptr, c_idx, nnz_sh, total = dist_spgemm_sharded_b(
            ops.a_ptr, ops.a_idx, ops.a_nnz, b_ptr_sh, b_idx_sh,
            mesh=ops.mesh, n_cols=m, flops_pad=ops.flops_pad,
        )
    else:
        c_ptr, c_idx, nnz_sh, total = dist_spgemm_sharded(
            ops.a_ptr, ops.a_idx, ops.a_nnz, ops.b_ptr, ops.b_idx,
            mesh=ops.mesh, n_cols=m, flops_pad=ops.flops_pad,
        )
    return _assemble_sharded(c_ptr, c_idx, nnz_sh, total, ops.bounds, (n, m))


def _fetch_global(x) -> np.ndarray:
    """Materialise a possibly cross-process-sharded array on this host.

    Single-process: plain device→host copy.  Multi-process (``jax.distributed``
    — the mpirun analogue): ``process_allgather`` fetches the remote shards,
    so every process assembles the full result (≡ the reference's
    gather-to-root, final/SpGEMM_mpi_omp.c:203-204, made symmetric)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _pull_valid_chunks(c_idx, valid: np.ndarray):
    """Compact-pull per-(shard[, chunk]) valid prefixes of a stacked padded
    device array (see ``ops.spgemm.compact_pull``) when the padded pull
    would be the bottleneck.  Single-process only — the multi-process fetch
    goes through ``process_allgather``.  Returns a flat list of per-chunk
    host arrays, or ``None`` to fall back to the padded fetch."""
    if jax.process_count() > 1:
        return None
    from ..ops.spgemm import compact_pull, should_compact_pull

    Pp = c_idx.shape[-1]
    n_chunks = int(np.prod(c_idx.shape[:-1]))
    if not should_compact_pull(
        n_chunks, Pp, c_idx.dtype.itemsize, int(valid.sum())
    ):
        return None
    # De-shard before the compaction gather (reshard strips the explicit
    # `@rows` aval sharding that survives device_put).  This path only
    # matters when the whole result drains through one slow host link, so
    # the replicated footprint mirrors the padded pull we were about to
    # make anyway.
    mesh = getattr(c_idx.sharding, "mesh", None)
    if mesh is not None:
        c_idx = jax.sharding.reshard(
            c_idx, NamedSharding(mesh, P(*([None] * c_idx.ndim)))
        )
    return compact_pull(c_idx.reshape(n_chunks, Pp), valid.reshape(-1))


def _assemble_subchunked(
    c_ptr, c_idx, nnz_sc, total, sub_bounds, shape, c_cnt=None
):
    """Host assembly of sub-chunked SPMD outputs (row pointers already global
    across chunks and shards).  With ``c_cnt`` (a counts stack laid out like
    ``c_idx``) returns ``(BCSR, counts)`` — the counting ops' contract."""
    c_ptr = _fetch_global(c_ptr)
    nnz_sc = _fetch_global(nnz_sc)
    C = sub_bounds.shape[1] - 1
    parts = _pull_valid_chunks(c_idx, nnz_sc.astype(np.int64))
    if parts is None:
        c_idx = _fetch_global(c_idx)
    if c_cnt is not None:
        cnt_parts = _pull_valid_chunks(c_cnt, nnz_sc.astype(np.int64))
        if cnt_parts is None:
            c_cnt = _fetch_global(c_cnt)
    indptr_parts = [np.zeros(1, np.int64)]
    index_parts = []
    count_parts = []
    base = 0
    for s in range(sub_bounds.shape[0]):
        for c in range(C):
            r0, r1 = sub_bounds[s, c], sub_bounds[s, c + 1]
            if r1 == r0:
                continue
            index_parts.append(
                parts[s * C + c] if parts is not None
                else c_idx[s, c, : nnz_sc[s, c]]
            )
            if c_cnt is not None:
                count_parts.append(
                    cnt_parts[s * C + c] if cnt_parts is not None
                    else c_cnt[s, c, : nnz_sc[s, c]]
                )
            # shard/chunk-local diffs + int64 host base — the device int32
            # prefix fix wraps past 2^31 total nnz (see _assemble_sharded)
            ptr = c_ptr[s, c].view(np.uint32)
            local = (ptr[1 : r1 - r0 + 1] - ptr[0]).astype(np.int64)
            indptr_parts.append(local + base)
            base += int(nnz_sc[s, c])
    indptr = np.concatenate(indptr_parts)
    indices = (
        np.concatenate(index_parts) if index_parts else np.zeros(0, np.int32)
    )
    assert indptr[-1] == base and (base - int(total)) % (1 << 32) == 0, (
        indptr[-1], base, int(total),
    )
    out = BCSR(indptr, indices, shape)
    if c_cnt is None:
        return out
    counts = (
        np.concatenate(count_parts).astype(np.int64)
        if count_parts
        else np.zeros(0, np.int64)
    )
    return out, counts


def _assemble_sharded(c_ptr, c_idx, nnz_sh, total, bounds, shape, c_cnt=None):
    """Host assembly of sharded SPMD outputs (already globally prefix-fixed).
    With ``c_cnt`` (a counts stack laid out like ``c_idx``) returns
    ``(BCSR, counts)`` — the counting ops' contract."""
    c_ptr = _fetch_global(c_ptr)
    nnz_sh = _fetch_global(nnz_sh)[:, 0]
    parts = _pull_valid_chunks(c_idx, nnz_sh.astype(np.int64))
    if parts is None:
        c_idx = _fetch_global(c_idx)
    if c_cnt is not None:
        cnt_parts = _pull_valid_chunks(c_cnt, nnz_sh.astype(np.int64))
        if cnt_parts is None:
            c_cnt = _fetch_global(c_cnt)
    indptr_parts = [np.zeros(1, np.int64)]
    index_parts = []
    count_parts = []
    base = 0
    for s, (r0, r1) in enumerate(zip(bounds, bounds[1:])):
        index_parts.append(
            parts[s] if parts is not None else c_idx[s, : nnz_sh[s]]
        )
        if c_cnt is not None:
            count_parts.append(
                cnt_parts[s] if cnt_parts is not None
                else c_cnt[s, : nnz_sh[s]]
            )
        # Rebuild global pointers from shard-LOCAL diffs + an int64 host
        # base: the device prefix fix is int32 and wraps past 2^31 total
        # output nnz; within-shard diffs recover exactly (mod-2^32 in
        # uint32, true values < 2^31).
        ptr = c_ptr[s].view(np.uint32)
        local = (ptr[1 : r1 - r0 + 1] - ptr[0]).astype(np.int64)
        indptr_parts.append(local + base)
        base += int(nnz_sh[s])
    indptr = np.concatenate(indptr_parts)
    indices = (
        np.concatenate(index_parts) if index_parts else np.zeros(0, np.int32)
    )
    assert indptr[-1] == base and (base - int(total)) % (1 << 32) == 0, (
        indptr[-1], base, int(total),
    )
    out = BCSR(indptr, indices, shape)
    if c_cnt is None:
        return out
    counts = (
        np.concatenate(count_parts).astype(np.int64)
        if count_parts
        else np.zeros(0, np.int64)
    )
    return out, counts
