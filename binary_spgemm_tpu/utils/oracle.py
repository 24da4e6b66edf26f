"""Ground-truth oracles for boolean SpGEMM.

The reference validates bit-exactly against MATLAB's sparse ``(A*B) > 0``
(Matlab/test_SpGEMM.m:20,53).  Here scipy.sparse plays MATLAB's role: its CSR
matmul is an independent C++ Gustavson implementation, and after
``sort_indices()`` its canonical form (sorted, deduplicated) matches the
reference kernel's output convention (ascending columns per row — the kernel
quicksorts each row, final/SpGEMM_mpi_omp.c:47).
"""
from __future__ import annotations

import numpy as np

from ..formats.bcsr import BCSR

__all__ = ["spgemm_oracle", "masked_spgemm_oracle", "union_oracle"]


def spgemm_oracle(a: BCSR, b: BCSR) -> BCSR:
    """Structure of C = A·B over the boolean (OR/AND) semiring."""
    c = a.to_scipy() @ b.to_scipy()
    c.sort_indices()
    # counts ≥ 1 everywhere, so the structure IS the boolean product's structure.
    return BCSR(c.indptr, c.indices, c.shape)


def masked_spgemm_oracle(f: BCSR, a: BCSR, b: BCSR) -> BCSR:
    """Structure of C = F .* (A·B)  (≡ SpGEMM_masked, final/SpGEMM_mpi_omp.c:232-288)."""
    c = (a.to_scipy() @ b.to_scipy()).multiply(f.to_scipy())
    c = c.tocsr()
    c.sort_indices()
    c.eliminate_zeros()
    return BCSR(c.indptr, c.indices, c.shape)


def union_oracle(a: BCSR, b: BCSR) -> BCSR:
    """Structure of A OR B (row-wise sparse union ≡ SpM_OR, old/utils.c:488-504)."""
    c = (a.to_scipy() + b.to_scipy()).tocsr()
    c.sort_indices()
    return BCSR(c.indptr, c.indices, c.shape)


def spgemm_dense_oracle(a: BCSR, b: BCSR) -> np.ndarray:
    """Tiny-size dense boolean matmul (independent of scipy) for cross-checking."""
    return (a.to_dense().astype(np.int64) @ b.to_dense().astype(np.int64)) > 0
