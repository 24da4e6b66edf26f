"""Boolean CSR (pattern-only) matrix container.

The reference (pavlidic/Binary-SpGEMM) represents boolean sparse matrices as two raw
C arrays — row pointers and column indices with no value array (final/SpGEMM_mpi_omp.c,
final/utils.c:47-81).  ``BCSR`` is the host-side equivalent: ``indptr: int32[n+1]``,
``indices: int32[nnz]``, shape ``(n, m)``.  There are no values anywhere in the
framework; the accumulation semiring is OR.

Host-side conversions (COO→CSR ≡ final/coo2csc.c:22-64, transpose, random generation ≡
Matlab/write_spm.m + Matlab/inc/utils.c:rndCSR) are numpy; the device-facing padded form
lives in :mod:`binary_spgemm_tpu.ops.spgemm`.
"""
from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["BCSR", "coo_to_csr_stable"]

INDEX_DTYPE = np.int32

# Row-pointer promotion threshold: an indptr whose total exceeds this is kept
# int64 (two-level outputs: int32 column indices + int64 row pointers).  The
# reference wraps at INT_MAX (its `int` nnz); we promote instead — the device
# kernels still work purely in the int32 domain (chunk-local pointers), only
# the host-assembled row pointers widen.  Module-level so tests can lower it.
INDPTR_INT32_MAX = int(np.iinfo(np.int32).max)


def coo_to_csr_stable(
    rows: np.ndarray, cols: np.ndarray, n_rows: int, n_cols: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Group COO entries by row with a *stable* (input-order-preserving) scatter.

    Mirrors the 4-pass histogram/cumsum/scatter of the reference's ``coo2csc``
    (final/coo2csc.c:33-62): entries that share a row keep their input order, and
    duplicates are *not* merged — both properties the reference relies on for
    bit-exactness of its ingest path.

    When ``n_cols`` is given, column indices are range-checked too: a column
    ≥ ``n_cols`` would collide with the device kernels' sentinel values and
    corrupt results silently (rows have always raised; cols must as well).
    """
    rows = np.asarray(rows, dtype=np.int64)
    raw_cols = np.asarray(cols)
    if len(raw_cols) and n_cols is not None:
        cmin, cmax = raw_cols.min(), raw_cols.max()
        if cmin < 0 or cmax >= n_cols:
            raise ValueError(
                f"column index out of range in COO->CSR: "
                f"[{cmin}, {cmax}] outside [0, {n_cols})"
            )
    cols = raw_cols.astype(INDEX_DTYPE, copy=False)
    if len(rows) and (rows.min() < 0 or rows.max() >= n_rows):
        raise ValueError("row index out of range in COO->CSR")
    ptr_dtype = np.int64 if len(rows) > INDPTR_INT32_MAX else INDEX_DTYPE
    # Native write-cursor counting sort (C, ≡ the reference's ingest tier);
    # falls back to the vectorised numpy scatter when no toolchain exists.
    # The native path works in int32 row pointers, so giant inputs take the
    # numpy path.
    from .. import native

    if ptr_dtype is INDEX_DTYPE:
        res = native.coo2csr(rows, cols, n_rows)
        if res is not None:
            indptr, indices = res
            return indptr.astype(INDEX_DTYPE), indices.astype(INDEX_DTYPE)
    counts = np.bincount(rows, minlength=n_rows)
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    # Stable counting-sort scatter (vectorised equivalent of coo2csc's write-cursor
    # loop): argsort with kind="stable" keys by row, preserving file order in ties.
    order = np.argsort(rows, kind="stable")
    indices = cols[order]
    return indptr.astype(ptr_dtype), indices.astype(INDEX_DTYPE)


@dataclasses.dataclass
class BCSR:
    """Host-side boolean CSR pattern matrix (no values; OR semiring)."""

    indptr: np.ndarray  # int32 [n_rows + 1] (int64 when nnz exceeds int32)
    indices: np.ndarray  # int32 [nnz]
    shape: tuple[int, int]

    def __post_init__(self):
        indptr = np.ascontiguousarray(self.indptr)
        total = int(indptr[-1]) if len(indptr) else 0
        # canonical dtype: int32 whenever the totals fit, int64 above — so a
        # giant product round-trips while ordinary matrices stay device-ready
        ptr_dtype = np.int64 if total > INDPTR_INT32_MAX else INDEX_DTYPE
        self.indptr = indptr.astype(ptr_dtype, copy=False)
        self.indices = np.ascontiguousarray(self.indices, dtype=INDEX_DTYPE)
        n = self.shape[0]
        if self.indptr.shape != (n + 1,):
            raise ValueError(
                f"indptr shape {self.indptr.shape} does not match n_rows={n}"
            )
        if self.indptr[0] != 0 or self.indptr[-1] != len(self.indices):
            raise ValueError("indptr must start at 0 and end at nnz")

    # -- basic properties ----------------------------------------------------------
    @property
    def nnz(self) -> int:
        return int(self.indices.shape[0])

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    def row(self, i: int) -> np.ndarray:
        return self.indices[self.indptr[i] : self.indptr[i + 1]]

    # -- constructors --------------------------------------------------------------
    @classmethod
    def from_coo(
        cls,
        rows: np.ndarray,
        cols: np.ndarray,
        shape: tuple[int, int],
        *,
        transpose: bool = False,
    ) -> "BCSR":
        """Build from COO pairs, preserving input order within each row.

        With ``transpose=True`` the entries are grouped by the *second* index and the
        stored indices are the *first* index — the semantics of the reference's
        ``readCOO`` (final/utils.c:77 passes ``(col, row)`` into ``coo2csc``), which
        yields the CSR of the transpose of the input pairs.
        """
        if transpose:
            rows, cols = cols, rows
            shape = (shape[1], shape[0])
        indptr, indices = coo_to_csr_stable(rows, cols, shape[0], shape[1])
        return cls(indptr, indices, shape)

    @classmethod
    def from_scipy(cls, mat) -> "BCSR":
        mat = mat.tocsr()
        return cls(
            np.asarray(mat.indptr),  # __post_init__ picks int32/int64
            mat.indices.astype(INDEX_DTYPE),
            tuple(mat.shape),
        )

    @classmethod
    def from_dense(cls, dense: np.ndarray) -> "BCSR":
        dense = np.asarray(dense) != 0
        rows, cols = np.nonzero(dense)
        return cls.from_coo(rows, cols, dense.shape)

    @classmethod
    def random(
        cls, n_rows: int, n_cols: int, nnz_per_row: float, *, seed: int = 0
    ) -> "BCSR":
        """Random Bernoulli pattern matrix ≈ MATLAB ``sprand(n, n, d/n) > 0``.

        Matches the distribution of the reference's benchmark inputs
        (Matlab/write_spm.m:5-8): ~``nnz_per_row`` nonzeros per row, uniform
        positions, duplicates merged.
        """
        rng = np.random.default_rng(seed)
        total_cells = n_rows * n_cols
        density = min(nnz_per_row / n_cols, 1.0)
        # sprand draws ~density*n*m distinct positions; Poisson-approximate the
        # pre-dedup draw count so the post-dedup density matches.
        k = int(rng.poisson(total_cells * density))
        if k == 0:
            return cls(np.zeros(n_rows + 1, INDEX_DTYPE), np.zeros(0, INDEX_DTYPE), (n_rows, n_cols))
        lin = rng.integers(0, total_cells, size=k, dtype=np.uint64)
        lin = np.unique(lin)
        rows = (lin // np.uint64(n_cols)).astype(np.int64)
        cols = (lin % np.uint64(n_cols)).astype(np.int64)
        return cls.from_coo(rows, cols, (n_rows, n_cols))

    @classmethod
    def banded(
        cls,
        n: int,
        nnz_per_row: float,
        bandwidth: int,
        *,
        seed: int = 0,
        diagonal: bool = True,
    ) -> "BCSR":
        """Banded random pattern: the cage-class structural stand-in.

        BASELINE.json configs 3/5 name SuiteSparse matrices (cage12,
        web-Google, com-Orkut); this environment has no network egress
        (recorded in BASELINE.md), so the sweep runs structure-matched
        generators instead.  cage-class matrices (DNA electrophoresis /
        mesh-like) are *banded* — entries cluster within ``bandwidth`` of
        the diagonal — which neither the uniform ``random`` nor the
        power-law ``rmat`` generator reproduces.  ~``nnz_per_row`` entries
        per row: the unit diagonal (when ``diagonal``) plus Poisson-drawn
        in-band offsets, deduplicated.
        """
        rng = np.random.default_rng(seed)
        extra = max(nnz_per_row - (1 if diagonal else 0), 0.0)
        counts = rng.poisson(extra, n)
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        off = rng.integers(-bandwidth, bandwidth + 1, len(rows))
        cols = np.clip(rows + off, 0, n - 1)
        if diagonal:
            diag = np.arange(n, dtype=np.int64)
            rows = np.concatenate([rows, diag])
            cols = np.concatenate([cols, diag])
        return cls.from_coo(rows, cols, (n, n)).sum_duplicates()

    @classmethod
    def random_blocked(
        cls,
        n: int,
        block: int = 128,
        blocks_per_row: float = 2.0,
        inner_density: float = 0.3,
        *,
        seed: int = 0,
    ) -> "BCSR":
        """Block-clustered random pattern: ~``blocks_per_row`` nonzero
        ``block×block`` tiles per block row, each filled Bernoulli
        ``inner_density``.  The input class where the blocked MXU path
        (``bsr_spgemm``) wins — the structure the reference's archived
        blocked designs targeted (old/BSpGEMM.c, report §2.1).
        """
        rng = np.random.default_rng(seed)
        nb = -(-n // block)
        k = int(blocks_per_row * nb)
        brows = rng.integers(0, nb, k)
        bcols = rng.integers(0, nb, k)
        keys = np.unique(brows.astype(np.int64) * nb + bcols)
        parts_r, parts_c = [], []
        for key in keys:
            br, bc = divmod(int(key), nb)
            h = min(block, n - br * block)
            w = min(block, n - bc * block)
            dense = rng.random((h, w)) < inner_density
            rr, cc = np.nonzero(dense)
            parts_r.append(rr + br * block)
            parts_c.append(cc + bc * block)
        if not parts_r:
            return cls(
                np.zeros(n + 1, INDEX_DTYPE), np.zeros(0, INDEX_DTYPE), (n, n)
            )
        return cls.from_coo(
            np.concatenate(parts_r), np.concatenate(parts_c), (n, n)
        )

    @classmethod
    def rmat(
        cls,
        scale: int,
        edge_factor: float = 16.0,
        *,
        a: float = 0.57,
        b: float = 0.19,
        c: float = 0.19,
        seed: int = 0,
        symmetric: bool = False,
    ) -> "BCSR":
        """R-MAT power-law graph pattern (Chakrabarti et al., SDM'04): the
        standard synthetic stand-in for SuiteSparse web/social graphs
        (Graph500 defaults a=0.57, b=c=0.19).

        ``2**scale`` vertices, ~``edge_factor`` edges per vertex; duplicates
        merged.  The skewed degree distribution is exactly the load-imbalance
        case the reference's equal-rows split handles badly
        (old/SpGEMM_omp.c:264's ``schedule(dynamic)`` experiment) and our
        flop-balanced partitioners are designed for.
        """
        n = 1 << scale
        n_edges = int(edge_factor * n)
        rng = np.random.default_rng(seed)
        rows = np.zeros(n_edges, np.int64)
        cols = np.zeros(n_edges, np.int64)
        # per bit: quadrant probabilities (a, b, c, d), vectorised over edges
        for level in range(scale):
            u = rng.random(n_edges)
            right = u >= (a + b)  # row bit set (quadrants c, d)
            # P(col bit | row bit): b/(a+b) top, d/(c+d) bottom
            d = 1.0 - a - b - c
            p_col = np.where(right, d / max(c + d, 1e-12), b / max(a + b, 1e-12))
            down = rng.random(n_edges) < p_col
            rows |= right.astype(np.int64) << level
            cols |= down.astype(np.int64) << level
        if symmetric:
            rows, cols = np.concatenate([rows, cols]), np.concatenate([cols, rows])
        mat = cls.from_coo(rows, cols, (n, n))
        return mat.sum_duplicates()

    @classmethod
    def from_torch(cls, t) -> "BCSR":
        """Build from a torch sparse tensor (CSR / COO / CSC layouts) or a
        dense torch tensor; nonzero values mark the pattern."""
        import torch

        if t.layout == torch.sparse_csr:
            vals = t.values().cpu().numpy()
            indptr = t.crow_indices().cpu().numpy()
            cols = t.col_indices().cpu().numpy()
            if np.all(vals != 0):
                return cls(indptr, cols, tuple(t.shape))
            # drop explicit zeros (torch keeps them after masked/sub ops)
            rows = np.repeat(np.arange(len(indptr) - 1), np.diff(indptr))
            keep = vals != 0
            return cls.from_coo(rows[keep], cols[keep], tuple(t.shape))
        if t.layout in (torch.sparse_coo, torch.sparse_csc):
            if t.layout == torch.sparse_csc:
                t = t.to_sparse_coo()
            t = t.coalesce()
            idx = t.indices().cpu().numpy()
            keep = t.values().cpu().numpy() != 0
            return cls.from_coo(idx[0][keep], idx[1][keep], tuple(t.shape))
        return cls.from_dense(t.cpu().numpy())

    def to_torch(self):
        """Export as a ``torch.sparse_csr_tensor`` with bool ones values."""
        import torch

        return torch.sparse_csr_tensor(
            torch.from_numpy(np.ascontiguousarray(self.indptr)),
            torch.from_numpy(np.ascontiguousarray(self.indices)),
            torch.ones(self.nnz, dtype=torch.bool),
            size=self.shape,
        )

    # -- conversions ---------------------------------------------------------------
    def to_scipy(self):
        import scipy.sparse as sp

        data = np.ones(self.nnz, dtype=np.int64)
        return sp.csr_matrix((data, self.indices, self.indptr), shape=self.shape)

    def to_dense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=bool)
        rows = np.repeat(np.arange(self.n_rows), np.diff(self.indptr))
        out[rows, self.indices] = True
        return out

    def to_coo(self) -> tuple[np.ndarray, np.ndarray]:
        rows = np.repeat(
            np.arange(self.n_rows, dtype=np.int64), np.diff(self.indptr)
        )
        return rows, self.indices.astype(np.int64)

    def transpose(self) -> "BCSR":
        rows, cols = self.to_coo()
        return BCSR.from_coo(cols, rows, (self.n_cols, self.n_rows))

    # -- canonicalisation ----------------------------------------------------------
    def sort_indices(self) -> "BCSR":
        """Return a copy with ascending column order within every row."""
        indices = self.indices.copy()
        rows, _ = self.to_coo()
        order = np.lexsort((self.indices, rows))
        return BCSR(self.indptr.copy(), indices[order], self.shape)

    def is_canonical(self) -> bool:
        """True when every row's columns are strictly ascending (sorted and
        deduplicated) — the form every op here emits."""
        if self.nnz <= 1:
            return True
        rows, cols = self.to_coo()
        keys = rows * np.int64(self.n_cols) + cols
        return bool(np.all(np.diff(keys) > 0))

    def sum_duplicates(self) -> "BCSR":
        """Return a canonical form: sorted per-row and deduplicated (self
        when already canonical — BCSR arrays are treated as immutable)."""
        if self.is_canonical():
            return self
        rows, cols = self.to_coo()
        keys = rows * np.int64(self.n_cols) + cols
        keys = np.unique(keys)
        rows = keys // self.n_cols
        cols = keys % self.n_cols
        return BCSR.from_coo(rows, cols, self.shape)

    # -- comparison (≡ SpGEMM_valid, final/SpGEMM_mpi_omp_validity.c:290-302) ------
    def equals(self, other: "BCSR") -> bool:
        return (
            self.shape == tuple(other.shape)
            and np.array_equal(self.indptr, other.indptr)
            and np.array_equal(self.indices, other.indices)
        )

    def diff(self, other: "BCSR", *, max_rows: int = 10) -> str:
        """Verbose mismatch report (≡ ``compare_CSR``'s verbose mode,
        old/csrXcsc.c:1043-1059): where two results diverge, row by row.

        Returns ``""`` when equal; otherwise a multi-line human-readable
        summary naming the first ``max_rows`` differing rows with their
        column sets — the debugging tool for a dist path miscompare."""
        if self.equals(other):
            return ""
        lines = []
        if self.shape != tuple(other.shape):
            lines.append(f"shape mismatch: {self.shape} vs {tuple(other.shape)}")
            return "\n".join(lines)
        if self.nnz != other.nnz:
            lines.append(f"nnz mismatch: {self.nnz} vs {other.nnz}")
        a_len = np.diff(self.indptr)
        b_len = np.diff(other.indptr)
        # rows differing either in length or in content
        bad_len = np.flatnonzero(a_len != b_len)
        same_len = np.flatnonzero(a_len == b_len)
        bad_rows = list(bad_len[:max_rows])
        if len(bad_rows) < max_rows and same_len.size:
            for i in same_len:
                s0, s1 = int(self.indptr[i]), int(self.indptr[i + 1])
                o0 = int(other.indptr[i])
                if not np.array_equal(
                    self.indices[s0:s1], other.indices[o0 : o0 + (s1 - s0)]
                ):
                    bad_rows.append(int(i))
                    if len(bad_rows) >= max_rows:
                        break
        bad_rows.sort()
        n_bad = int((a_len != b_len).sum())
        lines.append(
            f"{max(n_bad, len(bad_rows))}+ differing rows; first {len(bad_rows)}:"
        )
        for i in bad_rows[:max_rows]:
            i = int(i)
            lines.append(
                f"  row {i}: self({a_len[i]}) {self.row(i)[:16].tolist()}"
                f" vs other({b_len[i]}) {other.row(i)[:16].tolist()}"
            )
        return "\n".join(lines)

    def flops(self, other: "BCSR") -> int:
        """Gustavson flop count of self @ other: Σ_{(i,j)∈self} nnz(other row j)."""
        blen = np.diff(other.indptr).astype(np.int64)
        return int(blen[self.indices].sum())

    def __repr__(self):
        return f"BCSR(shape={self.shape}, nnz={self.nnz})"
