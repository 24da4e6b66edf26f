"""Host (CPU) engine for the small-flop regime.

The device path pays a ~27 ms dispatch+sync floor per call in this
environment, so inputs whose Gustavson flop count is tiny — the reference's
own committed ``make test`` fixture (final/Makefile:11-12: n = 50000,
25000 nnz, ~12.5K flops) is the canonical example — lose to any host CPU.
The auto-routers in :func:`..spgemm.spgemm`, :func:`..masked.masked_spgemm`
and :func:`..counts.spgemm_counts` divert such inputs here.

Two tiers, both our own code (the scipy oracle stays independent):

* **native** — C kernels in ``native/mmparse.c`` (``spgemm_host`` /
  ``masked_spgemm_host`` / ``spgemm_counts_host``): Gustavson with a
  *stamp* sparse accumulator (per-row tags instead of a bool array + reset
  walk, contrast final/SpGEMM_mpi_omp.c:36-50) and per-row
  insertion/qsort.  ~1-3 ns/flop.
* **numpy fallback** — vectorised ESC (grouped-arange expansion +
  ``np.unique``), pinned equivalent to the native kernels by tests.

Both produce the framework's output contract (exclusive row pointers,
per-row ascending deduplicated columns) — bit-exact with the device engines
and the scipy oracle.
"""
from __future__ import annotations

import numpy as np

from ..formats.bcsr import BCSR

__all__ = [
    "HOST_MAX_FLOPS",
    "HOST_OR_MAX_NNZ",
    "host_spgemm",
    "host_masked_spgemm",
    "host_spgemm_counts",
    "host_spm_or",
    "host_spgemm_or",
]

# Auto-router threshold: flop counts at or below this run on the host.
# The device floor is ~27 ms here; the native kernel does ~2e6 flops in
# ~5 ms including staging, so the crossover is comfortably above this.
HOST_MAX_FLOPS = 2_000_000

# Union auto-router threshold on COMBINED operand nnz: the host key-union
# (np.unique) measured 2.3 ms at 2^17 combined keys vs the ~27 ms device
# floor; past ~2^18 the host sort loses to the device's one-sort pipeline
# (64.6 ms at 2^19 combined).
HOST_OR_MAX_NNZ = 1 << 18


def _expand_numpy(a: BCSR, b: BCSR) -> tuple[np.ndarray, np.ndarray]:
    """All (row, col) products of the Gustavson expansion, duplicates kept."""
    alen = np.diff(a.indptr).astype(np.int64)
    a_rows = np.repeat(np.arange(a.n_rows, dtype=np.int64), alen)
    blen = np.diff(b.indptr).astype(np.int64)[a.indices]
    starts = b.indptr[a.indices].astype(np.int64)
    total = int(blen.sum())
    rows = np.repeat(a_rows, blen)
    # grouped arange: flat[k] walks each B row segment start..start+len
    seg_start = np.cumsum(blen) - blen
    offset = np.arange(total, dtype=np.int64) - np.repeat(seg_start, blen)
    flat = np.repeat(starts, blen) + offset
    cols = b.indices[flat].astype(np.int64)
    return rows, cols


def _keys_to_csr(keys: np.ndarray, n: int, m: int) -> BCSR:
    rows = keys // m
    cols = (keys % m).astype(np.int32)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=indptr[1:])
    return BCSR(indptr, cols, (n, m))


def host_spgemm(a: BCSR, b: BCSR) -> BCSR:
    """C = A·B on the host.  Callers guarantee ``a.flops(b)`` fits the
    int64 key domain (the router bounds it far below)."""
    n, m = a.n_rows, b.n_cols
    cap = a.flops(b)
    from .. import native

    res = native.spgemm_host(a.indptr, a.indices, n, m, b.indptr, b.indices, cap)
    if res is not None:
        c_ptr, c_idx, _ = res
        return BCSR(c_ptr.astype(np.int64), c_idx, (n, m))
    rows, cols = _expand_numpy(a, b)
    keys = np.unique(rows * np.int64(m) + cols)
    return _keys_to_csr(keys, n, m)


def host_spm_or(a: BCSR, b: BCSR) -> BCSR:
    """C = A OR B on the host: one ``np.unique`` over both operands' packed
    (row, col) keys — the reference's scalar sorted merge (old/utils.c:
    454-504) as a vectorised key union.  Same output contract as the
    device path; the router bounds combined nnz (``HOST_OR_MAX_NNZ``)."""
    n, m = a.shape
    ra, ca = a.to_coo()
    rb, cb = b.to_coo()
    keys = np.unique(
        np.concatenate(
            [
                ra.astype(np.int64) * m + ca,
                rb.astype(np.int64) * m + cb,
            ]
        )
    )
    return _keys_to_csr(keys, n, m)


def host_spgemm_or(
    d: BCSR, a: BCSR, b: BCSR, mask: BCSR | None = None
) -> BCSR:
    """C = D OR ((mask .*)? (A·B)) on the host — the fused-OR family's
    small-input route (≡ SpGEMM_dor, old/BSpGEMM.c:75-182), composed from
    the host product and key union.  Masked semantics match the device
    engines, not the reference: D is unconditional (``D ∪ (F ∩ A·B)``)
    where ``SpGEMM_dor_masked`` masks D too — see ops/fused.py docstring
    and PARITY.md O6 for the deliberate divergence."""
    c = host_spgemm(a, b) if mask is None else host_masked_spgemm(mask, a, b)
    return host_spm_or(d, c)


def host_masked_spgemm(f: BCSR, a: BCSR, b: BCSR) -> BCSR:
    """C = F .* (A·B) on the host (mask FIRST; ``f`` canonical)."""
    n, m = a.n_rows, b.n_cols
    cap = min(a.flops(b), f.nnz)
    from .. import native

    res = native.masked_spgemm_host(
        f.indptr, f.indices, a.indptr, a.indices, n, m,
        b.indptr, b.indices, cap,
    )
    if res is not None:
        c_ptr, c_idx, _ = res
        return BCSR(c_ptr.astype(np.int64), c_idx, (n, m))
    rows, cols = _expand_numpy(a, b)
    keys = np.unique(rows * np.int64(m) + cols)
    f_rows, f_cols = f.to_coo()
    f_keys = f_rows.astype(np.int64) * m + f_cols
    keys = np.intersect1d(keys, f_keys, assume_unique=True)
    return _keys_to_csr(keys, n, m)


def host_spgemm_counts(a: BCSR, b: BCSR) -> tuple[BCSR, np.ndarray]:
    """C = A·B structure + multiplicities on the host (operands canonical —
    the public entry canonicalises)."""
    n, m = a.n_rows, b.n_cols
    cap = a.flops(b)
    from .. import native

    res = native.spgemm_counts_host(
        a.indptr, a.indices, n, m, b.indptr, b.indices, cap
    )
    if res is not None:
        c_ptr, c_idx, c_cnt, _ = res
        return BCSR(c_ptr.astype(np.int64), c_idx, (n, m)), c_cnt
    rows, cols = _expand_numpy(a, b)
    keys, counts = np.unique(rows * np.int64(m) + cols, return_counts=True)
    return _keys_to_csr(keys, n, m), counts.astype(np.int64)
