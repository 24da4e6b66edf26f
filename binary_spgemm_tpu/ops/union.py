"""Row-wise sparse boolean union: C = A OR B.

The semiring "add" of the format — the reference implements it as a scalar sorted
two-pointer merge (``merge``/``SpM_OR``, old/utils.c:454-504) used by all of its
blocked accumulators.  TPU-natively this is just the compress stage of the ESC
pipeline applied to the concatenation of both operands' (row, col) pairs: one
two-key ``lax.sort`` + adjacent-dedup, fully vectorised.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.bcsr import BCSR
from .spgemm import INT, _row_ids, pad_bucket, pull_padded_tuple, sort_compress

__all__ = ["spm_or", "spm_or_padded"]


@functools.partial(jax.jit, static_argnames=("n_cols",))
def spm_or_padded(
    a_indptr: jax.Array,
    a_indices: jax.Array,
    a_nnz: jax.Array,
    b_indptr: jax.Array,
    b_indices: jax.Array,
    b_nnz: jax.Array,
    *,
    n_cols: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Jitted union over padded CSR arrays (same-shape operands).

    Returns ``(c_indptr, c_indices padded [len(a_idx)+len(b_idx)], nnz_c)``.
    """
    n_rows = a_indptr.shape[0] - 1
    pa, pb = a_indices.shape[0], b_indices.shape[0]

    def pairs(indptr, indices, nnz, pad):
        rows = _row_ids(indptr, pad)
        valid = jnp.arange(pad, dtype=INT) < nnz
        return (
            jnp.where(valid, rows, n_rows),
            jnp.where(valid, indices, n_cols),
        )

    ra, ca = pairs(a_indptr, a_indices, a_nnz, pa)
    rb, cb = pairs(b_indptr, b_indices, b_nnz, pb)
    row = jnp.concatenate([ra, rb])
    col = jnp.concatenate([ca, cb])
    return sort_compress(row, col, n_rows, n_cols)


def spm_or(a: BCSR, b: BCSR) -> BCSR:
    """C = A OR B structure (≡ SpM_OR, old/utils.c:488-504), canonical output."""
    if tuple(a.shape) != tuple(b.shape):
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    from .spgemm import require_int32_operands

    require_int32_operands(a, b)
    n, m = a.shape

    from .host import HOST_OR_MAX_NNZ, host_spm_or

    if a.nnz + b.nnz <= HOST_OR_MAX_NNZ:
        # small unions beat the ~27 ms device dispatch floor on the host
        # (2.3 ms at 2^17 combined keys) — same auto-route as spgemm()'s
        # small-flop regime
        return host_spm_or(a, b)

    def padded(mat):
        pad = pad_bucket(mat.nnz)
        idx = np.zeros(pad, np.int32)
        idx[: mat.nnz] = mat.indices
        return jnp.asarray(mat.indptr), jnp.asarray(idx), jnp.asarray(mat.nnz, INT)

    c_ptr, c_idx, nnz_c = spm_or_padded(*padded(a), *padded(b), n_cols=m)
    # host-side prefix slice: a device [:nnz] slice would compile per nnz
    ptr, idx, _ = pull_padded_tuple(c_ptr, c_idx, nnz_c)
    return BCSR(ptr, idx, (n, m))
