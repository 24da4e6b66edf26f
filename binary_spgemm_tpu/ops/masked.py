"""Masked boolean SpGEMM: C = F .* (A·B).

The reference's ``SpGEMM_masked`` (final/SpGEMM_mpi_omp.c:232-288) inverts its SPA:
the accumulator starts "all blocked", F's row unblocks allowed columns, and the
Gustavson loop then only admits in-mask columns.  The TPU-native equivalent keeps
the ESC pipeline of :mod:`.spgemm` and fuses the mask test **into the sort**
(``sort_compress_masked``): F's pairs join the candidate stream with a tag bit
that orders them first within an equal (row, col) run, so a candidate survives
iff its sorted predecessor is its own pair's mask entry.  That costs one
slightly longer sort instead of per-candidate random reads — the earlier
per-candidate bisection design measured 25× slower (log2(width) × 10 ns
random gathers per slot).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.bcsr import BCSR
from .spgemm import (
    INT,
    DEFAULT_CHUNK_FLOPS,
    _stitch_pipelined,
    expand_pairs,
    pad_bucket,
    pad_chunk_csr,
    pull_padded_tuple,
    row_flops,
    uniform_chunk_plan,
)

__all__ = ["masked_spgemm", "masked_spgemm_padded"]


@functools.partial(jax.jit, static_argnames=("n_cols", "flops_pad"))
def masked_spgemm_padded(
    f_indptr: jax.Array,
    f_indices: jax.Array,
    a_indptr: jax.Array,
    a_indices: jax.Array,
    a_nnz: jax.Array,
    b_indptr: jax.Array,
    b_indices: jax.Array,
    *,
    n_cols: int,
    flops_pad: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Jitted masked ESC SpGEMM.  Same contract as ``spgemm_padded`` plus mask
    F.  The mask test is the sort-fused join (``sort_compress_masked``) —
    see that function for the measured 25× difference vs probing."""
    from .spgemm import _row_ids, sort_compress_masked

    n_rows = a_indptr.shape[0] - 1
    row, col = expand_pairs(
        a_indptr, a_indices, a_nnz, b_indptr, b_indices,
        n_cols=n_cols, flops_pad=flops_pad,
    )
    f_rows = _row_ids(f_indptr, f_indices.shape[0])
    return sort_compress_masked(
        row, col, f_rows, f_indices, f_indptr[-1], n_rows, n_cols
    )


def masked_spgemm(
    f: BCSR,
    a: BCSR,
    b: BCSR,
    *,
    chunk_flops: int | None = None,
) -> BCSR:
    """C = F .* (A·B) structure (≡ SpGEMM_masked, final/SpGEMM_mpi_omp.c:232-288).

    F is canonicalised (sorted, deduplicated) host-side first; the reference
    imposes the same requirement implicitly (its mask walk assumes set semantics).
    """
    if a.n_cols != b.n_rows or f.shape != (a.n_rows, b.n_cols):
        raise ValueError(f"shape mismatch: F{f.shape} vs {a.shape} @ {b.shape}")
    from .spgemm import require_int32_operands

    require_int32_operands(f, a, b)
    n, m = a.n_rows, b.n_cols
    if a.nnz == 0 or b.nnz == 0 or f.nnz == 0:
        return BCSR(np.zeros(n + 1, np.int32), np.zeros(0, np.int32), (n, m))

    f = f.sum_duplicates()

    # Engine choice mirrors spgemm()/spgemm_or(): the sliced-ELL expansion
    # (row-gather, packed-key chunk sorts) beats ESC whenever its padded
    # expansion fits one program; the sort-fused mask join is shared, so
    # results stay bit-exact either way.  An explicit ``chunk_flops`` forces
    # the chunked ESC path below (the documented contract — previously the
    # ELL route ignored it).
    if chunk_flops is None:
        # small-flop inputs beat the device dispatch floor on the host
        from .host import HOST_MAX_FLOPS, host_masked_spgemm
        from .spgemm import spgemm_flops

        if spgemm_flops(a, b) <= HOST_MAX_FLOPS:
            return host_masked_spgemm(f, a, b)

        from .ell import AUTO_ELL_MAX_SLOTS, cached_executor

        # masked=True halves the chunk row cap so the (row, col, tag) sort
        # key stays single-int32 packed: measured 0.211 s vs 0.471 s at
        # n=256K d=16 (benchmarks/masked_cap.py); at n<=64K plans coincide.
        try:
            ex = cached_executor(a, b, masked=True)
            if ex.total_slots <= AUTO_ELL_MAX_SLOTS:
                # (masked outputs are not out_pad-truncated; use the
                # stricter sort-domain budget)
                return ex.assemble(ex.run_masked(f))
        except OverflowError:
            pass

    chunk_flops = chunk_flops or DEFAULT_CHUNK_FLOPS
    rf = row_flops(a, b)
    # the masked kernel packs (row, col, tag-bit) — row cap vs the wider key
    chunks, rows_pad, nnz_pad, flops_pad = uniform_chunk_plan(
        a, rf, chunk_flops, 2 * m + 1
    )
    # F is sliced to the same rows (so row ids line up inside the kernel) and
    # padded to one uniform size across chunks — one compile serves all.
    f_nnz_pad = pad_bucket(
        max(int(f.indptr[r1] - f.indptr[r0]) for r0, r1 in chunks)
    )
    b_indptr = jnp.asarray(b.indptr)
    b_indices = jnp.asarray(b.indices)

    def dispatch(r0, r1):
        ptr, idx, nnz_local = pad_chunk_csr(a, r0, r1, rows_pad, nnz_pad)
        f_ptr, f_idx, _ = pad_chunk_csr(f, r0, r1, rows_pad, f_nnz_pad, fill=m)
        return masked_spgemm_padded(
            jnp.asarray(f_ptr),
            jnp.asarray(f_idx),
            jnp.asarray(ptr),
            jnp.asarray(idx),
            jnp.asarray(nnz_local, INT),
            b_indptr,
            b_indices,
            n_cols=m,
            flops_pad=flops_pad,
        )

    def finish(out):
        return pull_padded_tuple(*out)

    return _stitch_pipelined(chunks, n, (n, m), dispatch, finish)
