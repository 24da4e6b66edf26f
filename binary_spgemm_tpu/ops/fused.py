"""Fused boolean kernels: C = D OR (A·B), optionally masked.

The reference's ``SpGEMM_dor`` family (old/BSpGEMM.c:75-367) fuses a previous
matrix D into the Gustavson accumulation by pre-seeding the SPA with D's row —
the accumulate primitive of its blocked designs.  In the ESC engine the fusion
is structural: D's (row, col) pairs are **concatenated with the expansion
candidates before the sort**, so the union costs one slightly longer sort
instead of a separate pass — the TPU analogue of SPA pre-seeding.

``SpGEMM_dor_masked`` (old/BSpGEMM.c:185-254) masks only the A·B term (D passes
through unmasked); ``masked=True`` reproduces that semantics.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.bcsr import BCSR
from .masked import rows_in_mask
from .spgemm import (
    INT,
    DEFAULT_CHUNK_FLOPS,
    _row_ids,
    _stitch,
    expand_pairs,
    pad_bucket,
    pad_chunk_csr,
    row_flops,
    sort_compress,
    uniform_chunk_plan,
)

__all__ = ["spgemm_or", "spgemm_or_padded"]


@functools.partial(
    jax.jit, static_argnames=("n_cols", "flops_pad", "bs_iters")
)
def spgemm_or_padded(
    d_indptr: jax.Array,
    d_indices: jax.Array,
    d_nnz: jax.Array,
    a_indptr: jax.Array,
    a_indices: jax.Array,
    a_nnz: jax.Array,
    b_indptr: jax.Array,
    b_indices: jax.Array,
    f_indptr: jax.Array | None = None,
    f_indices: jax.Array | None = None,
    *,
    n_cols: int,
    flops_pad: int,
    bs_iters: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Jitted C = D OR (F.*?(A·B)) over padded CSR arrays."""
    n_rows = a_indptr.shape[0] - 1
    row, col = expand_pairs(
        a_indptr, a_indices, a_nnz, b_indptr, b_indices,
        n_cols=n_cols, flops_pad=flops_pad,
    )
    if f_indptr is not None:
        keep = rows_in_mask(
            row, col, f_indptr, f_indices, n_rows=n_rows, bs_iters=bs_iters
        )
        row = jnp.where(keep, row, n_rows)
        col = jnp.where(keep, col, n_cols)
    # D's pairs join the candidate stream (SPA pre-seed analogue)
    pd = d_indices.shape[0]
    d_rows = _row_ids(d_indptr, pd)
    d_valid = jnp.arange(pd, dtype=INT) < d_nnz
    row = jnp.concatenate([row, jnp.where(d_valid, d_rows, n_rows)])
    col = jnp.concatenate([col, jnp.where(d_valid, d_indices, n_cols)])
    return sort_compress(row, col, n_rows, n_cols)


def spgemm_or(
    d: BCSR,
    a: BCSR,
    b: BCSR,
    *,
    mask: BCSR | None = None,
    chunk_flops: int | None = None,
) -> BCSR:
    """C = D OR (A·B), optionally D OR (mask .* (A·B)).

    ≡ ``SpGEMM_dor`` / ``SpGEMM_dor_masked`` (old/BSpGEMM.c:75-254).
    """
    if a.n_cols != b.n_rows or tuple(d.shape) != (a.n_rows, b.n_cols):
        raise ValueError(f"shape mismatch: D{d.shape} vs {a.shape} @ {b.shape}")
    n, m = a.n_rows, b.n_cols
    if a.nnz == 0 or b.nnz == 0:
        from .union import spm_or

        empty = BCSR(np.zeros(n + 1, np.int32), np.zeros(0, np.int32), (n, m))
        return spm_or(d, empty)

    bs_iters = 0
    if mask is not None:
        if tuple(mask.shape) != (n, m):
            raise ValueError(f"mask shape {mask.shape} != {(n, m)}")
        mask = mask.sum_duplicates()
        max_row = int(np.diff(mask.indptr).max()) if mask.nnz else 0
        bs_iters = max(1, math.ceil(math.log2(max_row + 1)) + 1)

    chunk_flops = chunk_flops or DEFAULT_CHUNK_FLOPS
    rf = row_flops(a, b)
    chunks, rows_pad, nnz_pad, flops_pad = uniform_chunk_plan(
        a, rf, chunk_flops, m
    )
    d_nnz_pad = pad_bucket(
        max(int(d.indptr[r1] - d.indptr[r0]) for r0, r1 in chunks)
    )
    if mask is not None:
        f_nnz_pad = pad_bucket(
            max(int(mask.indptr[r1] - mask.indptr[r0]) for r0, r1 in chunks)
        )
    b_indptr = jnp.asarray(b.indptr)
    b_indices = jnp.asarray(b.indices)

    def run_chunk(r0, r1):
        ptr, idx, nnz_local = pad_chunk_csr(a, r0, r1, rows_pad, nnz_pad)
        d_ptr, d_idx, d_local = pad_chunk_csr(d, r0, r1, rows_pad, d_nnz_pad)
        args = [
            jnp.asarray(d_ptr), jnp.asarray(d_idx), jnp.asarray(d_local, INT),
            jnp.asarray(ptr), jnp.asarray(idx), jnp.asarray(nnz_local, INT),
            b_indptr, b_indices,
        ]
        if mask is not None:
            f_ptr, f_idx, _ = pad_chunk_csr(mask, r0, r1, rows_pad, f_nnz_pad, fill=m)
            args += [jnp.asarray(f_ptr), jnp.asarray(f_idx)]
        return spgemm_or_padded(
            *args, n_cols=m, flops_pad=flops_pad, bs_iters=bs_iters
        )

    return _stitch(chunks, n, (n, m), run_chunk)
