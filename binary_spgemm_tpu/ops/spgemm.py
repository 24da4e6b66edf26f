"""TPU-native boolean SpGEMM: the expand–sort–compress (ESC) engine.

The reference computes C = A·B structure with a scalar Gustavson loop and a boolean
sparse accumulator (``SpGEMM_bigslice``, final/SpGEMM_mpi_omp.c:15-58): per output
row, random reads of B's rows, random writes into an ``xb`` byte array, a realloc'd
growing output, and a per-row quicksort.  Every one of those ingredients is hostile
to a TPU: data-dependent scalar control flow, pointer-chasing gathers, dynamic
output shapes.

The TPU-native formulation used here is ESC (expansion–sorting–compression):

1. **Expand** every A-nonzero (i, j) into the candidate pairs {(i, k) : k ∈ B(j,:)}.
   Fully vectorised: per-A-nonzero B-row lengths → prefix sum → per-slot index
   streams built by scatter-add + cumsum / scatter-max + cummax (see
   ``expand_pairs``) → one gather from B's indices.  Slots = Gustavson flops.
2. **Sort** the (row, col) pairs with one unstable ``lax.sort`` — packed into a
   single int32 key when shapes allow — replacing both the SPA's dedup *and*
   the reference's per-row quicksort (final/SpGEMM_mpi_omp.c:47) in one pass.
3. **Compress**: adjacent-duplicate masking, compaction by re-sorting with
   duplicates demoted to sentinels (a vector sort beats an element scatter on
   TPU), then a histogram+cumsum for row pointers — the two-pass symbolic/numeric
   replacement for the reference's realloc growth at :28-31.

Everything runs under ``jit`` with **static padded shapes**: the flop count is
computed host-side (one vectorised gather), rounded up to a bucket, and the padded
tail carries sentinel keys that sort to the end.  Dynamic output size is returned
as a traced scalar ``nnz_c`` next to a padded index array — the caller slices.

Output convention matches the reference bit-exactly: ascending, deduplicated
column indices per row; exclusive row pointers.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .bitonic import sort_rows as sort_rows_1key
import numpy as np

from ..formats.bcsr import BCSR

__all__ = [
    "DeviceBCSR",
    "spgemm",
    "spgemm_padded",
    "spgemm_flops",
    "row_flops",
    "pad_bucket",
    "uniform_chunk_plan",
    "pad_chunk_csr",
    "sort_compress",
    "packable",
    "compact_chunks",
    "compact_pull",
    "pull_chunk_prefixes",
    "pull_prefix",
]

INT = jnp.int32

# Default per-chunk flop budget for the host-chunked path.  48B/slot of live
# intermediates ⇒ 2^25 slots ≈ 1.6 GB peak — comfortable on a 16 GB chip.
DEFAULT_CHUNK_FLOPS = 1 << 25


def pad_bucket(n: int, minimum: int = 8, div: int = 16) -> int:
    """Round up to the next 1/``div``-octave bucket (multiples of
    2^k/``div`` within each power-of-two octave).

    Compile-cache-friendly padding with ≤~100/div % waste.  Pure power-of-two
    buckets cost up to 2× in sort/scan work right above a boundary — and the
    natural benchmark shapes (n, d powers of two ⇒ flops ≈ n·d²) sit *exactly*
    there (measured 0.60 s vs 0.29 s for flops 0.02% over 2^24).  ≤div cached
    kernel shapes per octave is cheap next to that.  ``div=32`` is used for
    final aggregate shapes (already input-specific) where the default step
    measurably wastes sort slots.
    """
    n = max(int(n), minimum)
    p = 1 << (n - 1).bit_length()  # smallest power of two ≥ n
    step = max(p // div, 1)
    return ((n + step - 1) // step) * step


# ---------------------------------------------------------------------------------
# Device-resident padded container
# ---------------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceBCSR:
    """Device-side boolean CSR with a padded index array (static shapes for jit).

    ``indptr`` is exact (``[n_rows+1]``); ``indices`` is padded to a bucket size
    with the tail undefined; ``nnz`` is the traced scalar count of valid entries.
    """

    indptr: jax.Array  # int32 [n_rows + 1]
    indices: jax.Array  # int32 [nnz_pad]
    nnz: jax.Array  # int32 scalar
    shape: tuple[int, int]

    def tree_flatten(self):
        return (self.indptr, self.indices, self.nnz), self.shape

    @classmethod
    def tree_unflatten(cls, shape, children):
        return cls(*children, shape=tuple(shape))

    @classmethod
    def from_host(
        cls,
        mat: BCSR,
        *,
        pad_to: int | None = None,
        require_canonical: bool = False,
    ) -> "DeviceBCSR":
        """Stage a host BCSR into HBM.

        Pass ``require_canonical=True`` when the matrix feeds the counting
        family (``spgemm_counts_device`` / ``masked_spgemm_counts_device`` /
        ``counts_sum_device``) or is used as a mask: duplicate operand
        entries silently inflate multiplicities there (the boolean device
        ops are immune — dedup is free in their sort)."""
        if require_canonical and not mat.is_canonical():
            raise ValueError(
                "operand is not canonical (per-row sorted, deduplicated); "
                "call .sum_duplicates() before staging — duplicate entries "
                "inflate counting-family multiplicities silently"
            )
        pad = pad_to if pad_to is not None else pad_bucket(mat.nnz)
        idx = np.zeros(pad, dtype=np.int32)
        idx[: mat.nnz] = mat.indices
        return cls(
            indptr=jnp.asarray(mat.indptr),
            indices=jnp.asarray(idx),
            nnz=jnp.asarray(mat.nnz, dtype=INT),
            shape=tuple(mat.shape),
        )

    def to_host(self) -> BCSR:
        # pull the padded array and slice host-side (a device [:nnz] slice
        # would compile one kernel per distinct nnz), paging only the prefix
        # off the device for giant padded results
        ptr, idx, _ = pull_padded_tuple(self.indptr, self.indices, self.nnz)
        return BCSR(ptr, idx, self.shape)

    def compact(self, pad_to: int | None = None) -> "DeviceBCSR":
        """Repack into a tighter padded index array, staying on device.

        Kernel outputs compact their valid entries into a prefix, so this is
        one STATIC-shape slice (the only host sync is the nnz scalar; the
        pad is power-of-two bucketed so repeated compactions reuse a handful
        of compiled shapes).  The iterated-product loops (reachability
        closure) call this between rounds so each round's expansion works on
        ``O(nnz)`` padding instead of the previous round's flop bound."""
        nnz = int(self.nnz)
        pad = pad_to if pad_to is not None else pad_bucket(max(nnz, 1))
        if pad < nnz:
            raise ValueError(f"pad_to {pad} would truncate {nnz} valid entries")
        if pad >= self.indices.shape[0]:
            return self
        return DeviceBCSR(
            self.indptr, jax.lax.slice(self.indices, (0,), (pad,)),
            self.nnz, self.shape,
        )


# ---------------------------------------------------------------------------------
# Traced building blocks
# ---------------------------------------------------------------------------------


def _owner_scan(starts: jax.Array, lengths: jax.Array, size: int) -> jax.Array:
    """For ``size`` flat slots partitioned into segments (``starts[k]`` = first slot
    of segment k, ``lengths[k]`` = its extent), return the owning segment id per
    slot.  Implemented as a unique-index scatter-max + cumulative max — O(size)
    vector work, no binary search.
    """
    k = jnp.arange(starts.shape[0], dtype=INT)
    dst = jnp.where(lengths > 0, starts, size)  # empty segments own no slots
    seg = jnp.zeros(size, INT).at[dst].max(k, mode="drop")
    return jax.lax.cummax(seg)


def _row_ids(indptr: jax.Array, nnz_pad: int) -> jax.Array:
    """Row id of each CSR entry (padded tail gets the last row id; callers mask)."""
    lengths = indptr[1:] - indptr[:-1]
    return _owner_scan(indptr[:-1], lengths, nnz_pad)


def packable(n_rows: int, n_cols: int) -> bool:
    """Can (row, col) pairs pack into one positive int32 key?  Requires
    ``(n_rows + 1) * next_pow2(n_cols + 1) ≤ 2^31`` (sentinel row included)."""
    shift = int(n_cols).bit_length()  # smallest s with n_cols < 2**s, so col field holds n_cols
    return (n_rows + 1) << shift <= (1 << 31)


def sort_compress(
    row: jax.Array, col: jax.Array, n_rows: int, n_cols: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sort candidate (row, col) pairs, dedupe, and compact into CSR form.

    Pairs with ``row == n_rows`` are padding sentinels (they sort last).  Returns
    ``(c_indptr [n_rows+1], c_indices padded [len(row)], nnz_c scalar)``.

    TPU notes: when the pair fits one positive int32 (``packable``), a single-key
    unstable sort is used (~30% cheaper than two-key); compaction is done by
    re-sorting with duplicates demoted to sentinels rather than by scatter — on
    TPU a full vector sort is ~4× cheaper than an element-wise scatter.
    """
    if packable(n_rows, n_cols):
        shift = int(n_cols).bit_length()
        key = (row << shift) | col
        key_s = jax.lax.sort((key,), is_stable=False)[0]
        prev = jnp.concatenate([jnp.full((1,), -1, INT), key_s[:-1]])
        keep = (key_s != prev) & (key_s < (n_rows << shift))
        nnz_c = jnp.sum(keep, dtype=INT)
        demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max)
        c_keys = jax.lax.sort((demoted,), is_stable=False)[0]
        c_indices = c_keys & ((1 << shift) - 1)
        if _histogram_indptr_wins(n_rows, row.shape[0]):
            c_indptr = _indptr_from_sorted_rows(
                jax.lax.shift_right_logical(c_keys, shift), n_rows
            )
        else:
            c_indptr = jnp.searchsorted(
                c_keys, jnp.arange(n_rows + 1, dtype=INT) << shift,
                side="left",
            ).astype(INT)
        return c_indptr, c_indices, nnz_c

    row_s, col_s = jax.lax.sort((row, col), num_keys=2, is_stable=False)
    prev_row = jnp.concatenate([jnp.full((1,), -1, INT), row_s[:-1]])
    prev_col = jnp.concatenate([jnp.full((1,), -1, INT), col_s[:-1]])
    new = (row_s != prev_row) | (col_s != prev_col)
    keep = new & (row_s < n_rows)
    nnz_c = jnp.sum(keep, dtype=INT)
    demoted_r = jnp.where(keep, row_s, n_rows)
    demoted_c = jnp.where(keep, col_s, n_cols)
    c_rows, c_indices = jax.lax.sort(
        (demoted_r, demoted_c), num_keys=2, is_stable=False
    )
    if _histogram_indptr_wins(n_rows, row.shape[0]):
        c_indptr = _indptr_from_sorted_rows(c_rows, n_rows)
    else:
        c_indptr = jnp.searchsorted(
            c_rows, jnp.arange(n_rows + 1, dtype=INT), side="left"
        ).astype(INT)
    return c_indptr, c_indices, nnz_c


def sort_compress_seps(
    row: jax.Array, col: jax.Array, n_rows: int, n_cols: int
) -> tuple[jax.Array, jax.Array]:
    """Sort/dedup/compact with **embedded row separators** instead of a
    device-side row-pointer pass.

    One synthetic candidate ``(r, n_cols)`` per output row joins the stream;
    it sorts after row r's real columns (all ``< n_cols``) and before row
    r+1, is unique (never deduped), and survives compaction — so the
    compacted index stream is ``row0 cols…, n_cols, row1 cols…, n_cols, …``
    and the host derives row pointers from the separator positions for free.
    Replaces the searchsorted/histogram row-pointer stage (measured ~10 ms
    of the 70 ms headline, benchmarks/decompose.py, stage "full"-"sort2").

    ``row``/``col`` must already include the ``n_rows`` separator pairs
    (callers append them so the padded stream shape covers them).  Returns
    ``(indices, nnz)`` where nnz counts real entries PLUS the ``n_rows``
    separators.
    """
    if packable(n_rows, n_cols):
        shift = int(n_cols).bit_length()
        return sort_compress_seps_keys((row << shift) | col, n_rows, n_cols)

    row_s, col_s = jax.lax.sort((row, col), num_keys=2, is_stable=False)
    prev_row = jnp.concatenate([jnp.full((1,), -1, INT), row_s[:-1]])
    prev_col = jnp.concatenate([jnp.full((1,), -1, INT), col_s[:-1]])
    new = (row_s != prev_row) | (col_s != prev_col)
    keep = new & (row_s < n_rows)
    nnz_c = jnp.sum(keep, dtype=INT)
    demoted_r = jnp.where(keep, row_s, n_rows)
    demoted_c = jnp.where(keep, col_s, n_cols)
    _, c_indices = jax.lax.sort(
        (demoted_r, demoted_c), num_keys=2, is_stable=False
    )
    return c_indices, nnz_c


def sort_compress_seps_keys(
    key: jax.Array, n_rows: int, n_cols: int
) -> tuple[jax.Array, jax.Array]:
    """1-D packed branch of :func:`sort_compress_seps` taking the
    PRE-PACKED key stream (separator keys ``(r << shift) | n_cols``
    included by the caller) — the unrolled engine's key-stream assembly."""
    shift = int(n_cols).bit_length()
    key_s = jax.lax.sort((key,), is_stable=False)[0]
    prev = jnp.concatenate([jnp.full((1,), -1, INT), key_s[:-1]])
    keep = (key_s != prev) & (key_s < (n_rows << shift))
    nnz_c = jnp.sum(keep, dtype=INT)
    demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max)
    c_keys = jax.lax.sort((demoted,), is_stable=False)[0]
    return c_keys & ((1 << shift) - 1), nnz_c


def sort_compress_seps_2d(
    row: jax.Array, col: jax.Array, n_rows: int, n_cols: int
) -> tuple[jax.Array, jax.Array]:
    """Batched :func:`sort_compress_seps`: ``row``/``col`` are ``[k, L]``
    with each row an independent chunk stream; sorts run along axis -1.

    Measured on v5e (benchmarks/micro.jsonl, bench "sort2d"): one 2-D sort
    of k short rows beats k unrolled 1-D sorts AND one long 1-D sort —
    1-key 2.15 ns/elem at L=2^25 vs 1.11 at [8192, 4096] (bitonic work per
    element scales with log² of the row length).  Batching also keeps
    chunk-local row ids small enough to pack at ANY matrix size, where the
    1-D engine fell back to 2-key sorts (3.25 ns) for n ≳ 2^14 rows.
    """
    k = row.shape[0]
    if packable(n_rows, n_cols):
        # NOTE: a fully-fused Pallas sort–dedup–sort kernel
        # (bitonic.fused_sort_compress) measured a TIE with this composition
        # end-to-end (0.1355 vs 0.1352 s at mid-256k k=32768, results.jsonl
        # ab="bitonic-e2e") — XLA already fuses the dedup pass between the
        # two sort_rows_1key calls, so the extra kernel complexity buys
        # nothing; kept unfused.
        shift = int(n_cols).bit_length()
        return sort_compress_seps_2d_keys((row << shift) | col, n_rows, n_cols)

    row_s, col_s = jax.lax.sort(
        (row, col), dimension=1, num_keys=2, is_stable=False
    )
    pad = jnp.full((k, 1), -1, INT)
    new = (row_s != jnp.concatenate([pad, row_s[:, :-1]], axis=1)) | (
        col_s != jnp.concatenate([pad, col_s[:, :-1]], axis=1)
    )
    keep = new & (row_s < n_rows)
    nnz_c = jnp.sum(keep, axis=1, dtype=INT)
    demoted_r = jnp.where(keep, row_s, n_rows)
    demoted_c = jnp.where(keep, col_s, n_cols)
    _, c_indices = jax.lax.sort(
        (demoted_r, demoted_c), dimension=1, num_keys=2, is_stable=False
    )
    return c_indices, nnz_c


def sort_compress_masked_seps_2d_keys(
    key: jax.Array,
    f_row: jax.Array,
    f_col: jax.Array,
    n_rows: int,
    n_cols: int,
) -> tuple[jax.Array, jax.Array]:
    """Packed branch of :func:`sort_compress_masked_seps_2d` taking the
    candidate stream as PRE-PACKED plain keys (``(row << bl) | col``): the
    tagged join key is one fused elementwise derivation ``(key << 1) | 1``
    (bit-identical to packing tagged pairs; requires the caller-checked
    ``packable(n_rows, 2 * n_cols + 1)``)."""
    k = key.shape[0]
    shift = int(n_cols).bit_length() + 1
    col_mask = (1 << (shift - 1)) - 1
    keys = jnp.concatenate(
        [
            (key << 1) | 1,
            (f_row << shift) | (f_col << 1),
        ],
        axis=1,
    )
    key_s = sort_rows_1key(keys)
    prev = jnp.concatenate(
        [jnp.full((k, 1), -2, INT), key_s[:, :-1]], axis=1
    )
    is_cand = (key_s & 1) == 1
    in_range = key_s < ((n_rows << shift) | 1)
    is_sep = is_cand & in_range & (
        ((key_s >> 1) & col_mask) == n_cols
    )
    keep = (is_cand & (prev == (key_s & ~1)) & in_range) | is_sep
    nnz_c = jnp.sum(keep, axis=1, dtype=INT)
    demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max)
    c_keys = sort_rows_1key(demoted)
    return (c_keys >> 1) & col_mask, nnz_c


def sort_compress_seps_2d_keys(
    key: jax.Array, n_rows: int, n_cols: int
) -> tuple[jax.Array, jax.Array]:
    """:func:`sort_compress_seps_2d` taking the PRE-PACKED ``[k, L]`` key
    stream (``(row << shift) | col``) — the batched engine assembles keys
    directly per class piece (`ops/ell.py::_assemble_stream_2d(shift=...)`)
    so no full-stream pack pass runs.  Element-identical to packing pair
    streams, hence bit-exact with the pair form."""
    k = key.shape[0]
    shift = int(n_cols).bit_length()
    limit = n_rows << shift
    key_s = sort_rows_1key(key)
    prev = jnp.concatenate([jnp.full((k, 1), -1, INT), key_s[:, :-1]], axis=1)
    keep = (key_s != prev) & (key_s < limit)
    nnz_c = jnp.sum(keep, axis=1, dtype=INT)
    demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max)
    c_keys = sort_rows_1key(demoted)
    return c_keys & ((1 << shift) - 1), nnz_c


def sort_compress_2d_keys(
    key: jax.Array, n_rows: int, n_cols: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Packed branch of :func:`sort_compress_2d` taking the PRE-PACKED
    ``[C, L]`` key stream (``(row << bl) | col``) — the SPMD batched step
    assembles keys directly per sub-chunk
    (`parallel/dist_spgemm.py::_ell_expand_chunk(shift=...)`).
    Bit-identical to the pair form."""
    C = key.shape[0]
    cidx = jnp.arange(C, dtype=INT)[:, None]
    shift = int(n_cols).bit_length()
    key_s = sort_rows_1key(key)
    prev = jnp.concatenate(
        [jnp.full((C, 1), -1, INT), key_s[:, :-1]], axis=1
    )
    keep = (key_s != prev) & (key_s < (n_rows << shift))
    nnz_c = jnp.sum(keep, axis=1, dtype=INT)
    demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max)
    c_keys = sort_rows_1key(demoted)
    c_indices = c_keys & ((1 << shift) - 1)
    rows_sorted = jnp.minimum(
        jax.lax.shift_right_logical(c_keys, shift), n_rows
    )
    counts = jnp.zeros((C, n_rows + 2), INT).at[
        cidx, rows_sorted + 1
    ].add(1)
    c_indptr = jnp.cumsum(counts, axis=1, dtype=INT)[:, : n_rows + 1]
    return c_indptr, c_indices, nnz_c


def sort_compress_2d(
    row: jax.Array, col: jax.Array, n_rows: int, n_cols: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched :func:`sort_compress`: ``row``/``col`` are ``[C, L]`` chunk
    streams, sorts run along axis -1, and per-chunk exclusive row pointers
    come from a batched scatter-add histogram (``n_rows`` is the per-chunk
    row count — small, so the histogram always wins here).  Returns
    ``(c_indptr [C, n_rows+1], c_indices [C, L], nnz [C])``.  Used by the
    SPMD ELL step to serve many packed sub-chunks with ONE 2-D sort instead
    of an unrolled loop (parallel/dist_spgemm.py::dist_spgemm_ell)."""
    C = row.shape[0]
    cidx = jnp.arange(C, dtype=INT)[:, None]
    if packable(n_rows, n_cols):
        shift = int(n_cols).bit_length()
        return sort_compress_2d_keys((row << shift) | col, n_rows, n_cols)

    row_s, col_s = jax.lax.sort(
        (row, col), dimension=1, num_keys=2, is_stable=False
    )
    pad1 = jnp.full((C, 1), -1, INT)
    new = (row_s != jnp.concatenate([pad1, row_s[:, :-1]], axis=1)) | (
        col_s != jnp.concatenate([pad1, col_s[:, :-1]], axis=1)
    )
    keep = new & (row_s < n_rows)
    nnz_c = jnp.sum(keep, axis=1, dtype=INT)
    demoted_r = jnp.where(keep, row_s, n_rows)
    demoted_c = jnp.where(keep, col_s, n_cols)
    c_rows, c_indices = jax.lax.sort(
        (demoted_r, demoted_c), dimension=1, num_keys=2, is_stable=False
    )
    counts = jnp.zeros((C, n_rows + 2), INT).at[
        cidx, jnp.minimum(c_rows, n_rows) + 1
    ].add(1)
    c_indptr = jnp.cumsum(counts, axis=1, dtype=INT)[:, : n_rows + 1]
    return c_indptr, c_indices, nnz_c


def split_seps(
    indices: np.ndarray, nnz: int, n_rows: int, n_cols: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Host inverse of :func:`sort_compress_seps`: split a separator-embedded
    compacted index stream into ``(indptr [n_rows+1], indices, real_nnz)``."""
    valid = indices[:nnz]
    bpos = np.flatnonzero(valid == n_cols)
    if len(bpos) != n_rows:
        raise RuntimeError(
            f"separator-count invariant violated: found {len(bpos)} row "
            f"separators in the compacted stream, expected {n_rows}"
        )
    ptr = np.empty(n_rows + 1, np.int64)
    ptr[0] = 0
    ptr[1:] = bpos - np.arange(n_rows, dtype=np.int64)
    return ptr, np.delete(valid, bpos), int(nnz) - n_rows


def sort_compress_masked_seps(
    row: jax.Array,
    col: jax.Array,
    f_row: jax.Array,
    f_col: jax.Array,
    f_nnz: jax.Array,
    n_rows: int,
    n_cols: int,
) -> tuple[jax.Array, jax.Array]:
    """:func:`sort_compress_masked` with embedded row separators (see
    :func:`sort_compress_seps`): callers append one ``(r, n_cols)`` candidate
    per output row to the candidate stream; separators survive the mask join
    unconditionally (no mask predecessor needed) and mark row boundaries in
    the compacted index stream.  Returns ``(indices, nnz)`` — no device
    row-pointer pass."""
    fi = jnp.arange(f_row.shape[0], dtype=INT)
    f_valid = fi < f_nnz
    f_row = jnp.where(f_valid, f_row, n_rows)
    f_col = jnp.where(f_valid, f_col, n_cols)

    if packable(n_rows, 2 * n_cols + 1):
        shift = int(n_cols).bit_length() + 1
        col_mask = (1 << (shift - 1)) - 1
        keys = jnp.concatenate(
            [
                ((row << shift) | (col << 1)) | 1,
                (f_row << shift) | (f_col << 1),
            ]
        )
        key_s = jax.lax.sort((keys,), is_stable=False)[0]
        prev = jnp.concatenate([jnp.full((1,), -2, INT), key_s[:-1]])
        is_cand = (key_s & 1) == 1
        in_range = key_s < ((n_rows << shift) | 1)
        is_sep = is_cand & in_range & (
            ((key_s >> 1) & col_mask) == n_cols
        )
        keep = (is_cand & (prev == (key_s & ~1)) & in_range) | is_sep
        nnz_c = jnp.sum(keep, dtype=INT)
        demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max)
        c_keys = jax.lax.sort((demoted,), is_stable=False)[0]
        return (c_keys >> 1) & col_mask, nnz_c

    rows = jnp.concatenate([row, f_row])
    cols = jnp.concatenate([col, f_col])
    tags = jnp.concatenate(
        [jnp.ones(row.shape[0], INT), jnp.zeros(f_row.shape[0], INT)]
    )
    row_s, col_s, tag_s = jax.lax.sort(
        (rows, cols, tags), num_keys=3, is_stable=False
    )
    prev_row = jnp.concatenate([jnp.full((1,), -1, INT), row_s[:-1]])
    prev_col = jnp.concatenate([jnp.full((1,), -1, INT), col_s[:-1]])
    prev_tag = jnp.concatenate([jnp.ones((1,), INT), tag_s[:-1]])
    in_range = row_s < n_rows
    is_sep = (tag_s == 1) & (col_s == n_cols) & in_range
    keep = (
        (tag_s == 1)
        & (row_s == prev_row)
        & (col_s == prev_col)
        & (prev_tag == 0)
        & in_range
    ) | is_sep
    nnz_c = jnp.sum(keep, dtype=INT)
    demoted_r = jnp.where(keep, row_s, n_rows)
    demoted_c = jnp.where(keep, col_s, n_cols)
    _, c_indices = jax.lax.sort(
        (demoted_r, demoted_c), num_keys=2, is_stable=False
    )
    return c_indices, nnz_c


def sort_compress_masked_seps_2d(
    row: jax.Array,
    col: jax.Array,
    f_row: jax.Array,
    f_col: jax.Array,
    n_rows: int,
    n_cols: int,
) -> tuple[jax.Array, jax.Array]:
    """Batched :func:`sort_compress_masked_seps`: ``row``/``col`` are
    ``[k, Lc]`` per-chunk candidate streams (separators included by the
    caller), ``f_row``/``f_col`` are ``[k, Pf]`` mask pairs already
    sentinel-masked to ``(n_rows, n_cols)`` on padding slots; the tagged
    mask-join sorts run along axis -1 (same structural win as
    :func:`sort_compress_seps_2d` — short packed per-chunk sorts at any
    matrix size).  Returns sep-embedded ``(indices [k, Lc+Pf], nnz [k])``.
    Bit-exact with the reference's masked kernel
    (final/SpGEMM_mpi_omp.c:232-288) chunk by chunk."""
    k = row.shape[0]
    if packable(n_rows, 2 * n_cols + 1):
        bl = int(n_cols).bit_length()
        return sort_compress_masked_seps_2d_keys(
            (row << bl) | col, f_row, f_col, n_rows, n_cols
        )

    rows = jnp.concatenate([row, f_row], axis=1)
    cols = jnp.concatenate([col, f_col], axis=1)
    tags = jnp.concatenate(
        [jnp.ones(row.shape, INT), jnp.zeros(f_row.shape, INT)], axis=1
    )
    row_s, col_s, tag_s = jax.lax.sort(
        (rows, cols, tags), dimension=1, num_keys=3, is_stable=False
    )
    pad1 = jnp.full((k, 1), -1, INT)
    prev_row = jnp.concatenate([pad1, row_s[:, :-1]], axis=1)
    prev_col = jnp.concatenate([pad1, col_s[:, :-1]], axis=1)
    prev_tag = jnp.concatenate(
        [jnp.ones((k, 1), INT), tag_s[:, :-1]], axis=1
    )
    in_range = row_s < n_rows
    is_sep = (tag_s == 1) & (col_s == n_cols) & in_range
    keep = (
        (tag_s == 1)
        & (row_s == prev_row)
        & (col_s == prev_col)
        & (prev_tag == 0)
        & in_range
    ) | is_sep
    nnz_c = jnp.sum(keep, axis=1, dtype=INT)
    demoted_r = jnp.where(keep, row_s, n_rows)
    demoted_c = jnp.where(keep, col_s, n_cols)
    _, c_indices = jax.lax.sort(
        (demoted_r, demoted_c), dimension=1, num_keys=2, is_stable=False
    )
    return c_indices, nnz_c


def sort_compress_masked(
    row: jax.Array,
    col: jax.Array,
    f_row: jax.Array,
    f_col: jax.Array,
    f_nnz: jax.Array,
    n_rows: int,
    n_cols: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Masked sort/compress: keep candidate pairs that appear in mask F.

    The mask test is **fused into the sort** instead of a per-candidate
    bisection: mask pairs join the candidate stream with a tag bit that
    sorts them *first* within an equal (row, col) run, so a candidate
    survives iff its sorted predecessor is its own pair's mask entry (later
    duplicates see a candidate predecessor and die — dedup falls out of the
    same comparison).  This replaces ``rows_in_mask``'s log2(row-width)
    random gathers per slot (~6×10 ns — measured 1.78 s vs 0.072 s unmasked
    on the headline config) with one slightly longer sort plus streaming
    compares.

    ``f_row``/``f_col`` are padded mask pairs (entries ≥ ``f_nnz`` are
    ignored); F must be canonical (sorted, deduplicated).  Sentinel
    convention and return contract match :func:`sort_compress`; the padded
    index array has ``len(row) + len(f_row)`` slots.
    """
    fi = jnp.arange(f_row.shape[0], dtype=INT)
    f_valid = fi < f_nnz
    f_row = jnp.where(f_valid, f_row, n_rows)
    f_col = jnp.where(f_valid, f_col, n_cols)

    if packable(n_rows, 2 * n_cols + 1):
        # pack (row, col, tag) into one key; tag 0 = mask entry (sorts first)
        shift = int(n_cols).bit_length() + 1
        keys = jnp.concatenate(
            [
                ((row << shift) | (col << 1)) | 1,
                (f_row << shift) | (f_col << 1),
            ]
        )
        key_s = jax.lax.sort((keys,), is_stable=False)[0]
        prev = jnp.concatenate([jnp.full((1,), -2, INT), key_s[:-1]])
        is_cand = (key_s & 1) == 1
        keep = (
            is_cand
            & (prev == (key_s & ~1))  # predecessor is THIS pair's mask entry
            & (key_s < ((n_rows << shift) | 1))
        )
        nnz_c = jnp.sum(keep, dtype=INT)
        demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max)
        c_keys = jax.lax.sort((demoted,), is_stable=False)[0]
        c_indices = (c_keys >> 1) & ((1 << (shift - 1)) - 1)
        rows_sorted = jax.lax.shift_right_logical(c_keys, shift)
        if _histogram_indptr_wins(n_rows, keys.shape[0]):
            c_indptr = _indptr_from_sorted_rows(rows_sorted, n_rows)
        else:
            c_indptr = jnp.searchsorted(
                c_keys,
                (jnp.arange(n_rows + 1, dtype=INT) << shift),
                side="left",
            ).astype(INT)
        return c_indptr, c_indices, nnz_c

    rows = jnp.concatenate([row, f_row])
    cols = jnp.concatenate([col, f_col])
    tags = jnp.concatenate(
        [jnp.ones(row.shape[0], INT), jnp.zeros(f_row.shape[0], INT)]
    )
    row_s, col_s, tag_s = jax.lax.sort(
        (rows, cols, tags), num_keys=3, is_stable=False
    )
    prev_row = jnp.concatenate([jnp.full((1,), -1, INT), row_s[:-1]])
    prev_col = jnp.concatenate([jnp.full((1,), -1, INT), col_s[:-1]])
    prev_tag = jnp.concatenate([jnp.ones((1,), INT), tag_s[:-1]])
    keep = (
        (tag_s == 1)
        & (row_s == prev_row)
        & (col_s == prev_col)
        & (prev_tag == 0)
        & (row_s < n_rows)
    )
    nnz_c = jnp.sum(keep, dtype=INT)
    demoted_r = jnp.where(keep, row_s, n_rows)
    demoted_c = jnp.where(keep, col_s, n_cols)
    c_rows, c_indices = jax.lax.sort(
        (demoted_r, demoted_c), num_keys=2, is_stable=False
    )
    if _histogram_indptr_wins(n_rows, rows.shape[0]):
        c_indptr = _indptr_from_sorted_rows(c_rows, n_rows)
    else:
        c_indptr = jnp.searchsorted(
            c_rows, jnp.arange(n_rows + 1, dtype=INT), side="left"
        ).astype(INT)
    return c_indptr, c_indices, nnz_c


def _histogram_indptr_wins(n_rows: int, n_slots: int) -> bool:
    """Pick the cheaper row-pointer formulation (static shapes → static pick).

    searchsorted costs ~10 ns per of its n_rows·log2(n_slots) random reads;
    the scatter-add histogram costs ~7 ns per of its n_slots scattered
    writes.  Calibrated on v5e per-chunk timings: 8K and 32K rows × 2.6M
    slots → searchsorted wins (histogram cost ~18 ms/chunk); 155K rows ×
    2.8M slots → histogram wins by ~16 ms/chunk.
    """
    import math

    log_len = max(math.log2(max(n_slots, 2)), 1.0)
    return n_rows * log_len * 10 > n_slots * 7


def _indptr_from_sorted_rows(rows_sorted: jax.Array, n_rows: int) -> jax.Array:
    """Exclusive row pointers from (sorted) per-entry row ids.

    One scatter-add histogram + a tiny cumsum — the large-n/low-density
    alternative to searchsorted (see ``_histogram_indptr_wins``).
    Entries with ``row ≥ n_rows`` (sort sentinels) accumulate in a dropped
    tail bucket.
    """
    counts = jnp.zeros(n_rows + 2, INT).at[
        jnp.minimum(rows_sorted, n_rows) + 1
    ].add(1)
    return jnp.cumsum(counts, dtype=INT)[: n_rows + 1]


def compress_pairs(
    row_s: jax.Array, col_s: jax.Array, n_rows: int, n_cols: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Back-compat shim: dedupe already-sorted pairs (re-sorts internally)."""
    return sort_compress(row_s, col_s, n_rows, n_cols)


def _forward_fill_last(
    values: jax.Array, mask: jax.Array
) -> jax.Array:
    """``out[k]`` = ``values[j]`` for the largest ``j ≤ k`` with ``mask[j]``
    (0 where no such j).  Max-by-position pair scan — associative, vectorises."""
    n = values.shape[0]
    tag = jnp.where(mask, jnp.arange(n, dtype=INT), -1)
    val = jnp.where(mask, values, 0)

    def comb(a, b):
        ta, va = a
        tb, vb = b
        take_b = tb >= ta
        return jnp.where(take_b, tb, ta), jnp.where(take_b, vb, va)

    _, filled = jax.lax.associative_scan(comb, (tag, val))
    return filled


def expand_pairs(
    a_indptr: jax.Array,
    a_indices: jax.Array,
    a_nnz: jax.Array,
    b_indptr: jax.Array,
    b_indices: jax.Array,
    *,
    n_cols: int,
    flops_pad: int,
    b_row_starts: jax.Array | None = None,
    b_row_lens: jax.Array | None = None,
    b_col_base: jax.Array | int = 0,
) -> tuple[jax.Array, jax.Array]:
    """ESC expansion: all candidate (row, col) pairs of C = A·B, padded to
    ``flops_pad`` with (n_rows, n_cols) sentinels.

    TPU-tuned formulation: per-slot segment ownership is never materialised via
    per-slot *gathers* (XLA's 1-D random gather runs ~10× slower than streaming
    vector ops on TPU).  Instead:

    * the B-index stream ``bidx[t]`` (which element of B's index array slot t
      reads) advances by +1 within a segment and jumps at segment starts — so it
      is exactly ``cumsum`` of a ones-array with per-segment jump corrections
      scatter-added at the (unique) segment start slots;
    * the output row id is nondecreasing over slots — so it is ``cummax`` of row
      ids scatter-maxed at segment starts.

    The only remaining per-slot gather is the unavoidable data fetch
    ``b_indices[bidx]``.

    ``b_row_starts``/``b_row_lens`` (optional) generalise B's row addressing
    beyond classic CSR: row j of B occupies
    ``b_indices[b_row_starts[j] : b_row_starts[j] + b_row_lens[j]]``.  Used by
    the sharded-B distributed path, whose all-gathered B carries per-shard
    padding gaps; ``b_indptr`` is ignored when they are given.

    ``b_col_base`` (optional, traced) shifts that addressing to a *window* of
    B's rows: ``b_row_starts``/``b_row_lens`` describe global B rows
    ``[b_col_base, b_col_base + len(b_row_lens))`` and A-entries whose column
    falls outside the window expand to nothing.  This is what lets the
    ring-pipelined distributed path expand against one in-flight B shard at a
    time (see ``parallel/dist_spgemm.py::dist_spgemm_ring``).
    """
    nnz_pad = a_indices.shape[0]
    n_rows = a_indptr.shape[0] - 1
    E = flops_pad
    ar = jnp.arange(nnz_pad, dtype=INT)
    valid_a = ar < a_nnz
    acol = jnp.where(valid_a, a_indices, 0)
    if b_row_starts is not None:
        local = acol - b_col_base
        n_local = b_row_lens.shape[0]
        in_window = (local >= 0) & (local < n_local)
        lidx = jnp.clip(local, 0, n_local - 1)
        bstart = b_row_starts[lidx]
        blen = jnp.where(valid_a & in_window, b_row_lens[lidx], 0)
    else:
        bstart = b_indptr[acol]
        blen = jnp.where(valid_a, b_indptr[acol + 1] - bstart, 0)
    cum = jnp.cumsum(blen, dtype=INT)
    total = cum[-1]
    offs = cum - blen
    rowid_a = _row_ids(a_indptr, nnz_pad)

    # Jump corrections: delta[k] = bstart[k] - offs[k]; at the start slot of a
    # nonempty segment k, bidx must jump by delta[k] - delta[prev nonempty].
    ne = blen > 0
    delta = bstart - offs
    ff = _forward_fill_last(delta, ne)
    prev_delta = jnp.concatenate([jnp.zeros(1, INT), ff[:-1]])
    jumps = delta - prev_delta
    starts = jnp.where(ne, offs, E)  # distinct for nonempty segments
    v = jnp.ones(E, INT).at[starts].add(jumps, mode="drop")
    bidx = jnp.cumsum(v, dtype=INT) - 1

    rid = jnp.zeros(E, INT).at[starts].max(rowid_a, mode="drop")
    row = jax.lax.cummax(rid)

    t = jnp.arange(E, dtype=INT)
    valid_t = t < total
    bidx = jnp.clip(bidx, 0, b_indices.shape[0] - 1)
    col = b_indices[bidx]
    row = jnp.where(valid_t, row, n_rows)
    col = jnp.where(valid_t, col, n_cols)
    return row, col


def esc_spgemm(
    a_indptr: jax.Array,
    a_indices: jax.Array,
    a_nnz: jax.Array,
    b_indptr: jax.Array,
    b_indices: jax.Array,
    *,
    n_cols: int,
    flops_pad: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Traced ESC SpGEMM over padded CSR arrays (composable: call under jit,
    vmap, or inside a ``shard_map`` shard function).

    Returns ``(c_indptr [n_rows+1], c_indices padded [flops_pad], nnz_c)``.
    """
    n_rows = a_indptr.shape[0] - 1
    row, col = expand_pairs(
        a_indptr, a_indices, a_nnz, b_indptr, b_indices,
        n_cols=n_cols, flops_pad=flops_pad,
    )
    return sort_compress(row, col, n_rows, n_cols)


spgemm_padded = jax.jit(esc_spgemm, static_argnames=("n_cols", "flops_pad"))
spgemm_padded.__doc__ = "Jitted entry point for :func:`esc_spgemm`."


def esc_spgemm_seps(
    a_indptr: jax.Array,
    a_indices: jax.Array,
    a_nnz: jax.Array,
    b_indptr: jax.Array,
    b_indices: jax.Array,
    *,
    n_cols: int,
    flops_pad: int,
) -> tuple[jax.Array, jax.Array]:
    """:func:`esc_spgemm` with embedded row separators
    (:func:`sort_compress_seps`): no device row-pointer pass; the host splits
    pointers off the compacted stream (:func:`split_seps`).  Returns
    ``(c_indices padded [flops_pad + n_rows], nnz incl. separators)``."""
    n_rows = a_indptr.shape[0] - 1
    row, col = expand_pairs(
        a_indptr, a_indices, a_nnz, b_indptr, b_indices,
        n_cols=n_cols, flops_pad=flops_pad,
    )
    row = jnp.concatenate([row, jnp.arange(n_rows, dtype=INT)])
    col = jnp.concatenate([col, jnp.full((n_rows,), n_cols, INT)])
    return sort_compress_seps(row, col, n_rows, n_cols)


spgemm_padded_seps = jax.jit(
    esc_spgemm_seps, static_argnames=("n_cols", "flops_pad")
)
spgemm_padded_seps.__doc__ = "Jitted entry point for :func:`esc_spgemm_seps`."


# ---------------------------------------------------------------------------------
# Host-level API
# ---------------------------------------------------------------------------------


def row_flops(a: BCSR, b: BCSR) -> np.ndarray:
    """Per-output-row Gustavson flop counts of A·B (host; native parallel
    pass when available, vectorised numpy otherwise)."""
    blen = np.diff(b.indptr).astype(np.int64)
    if a.nnz:
        from ..native import row_weight

        out = row_weight(a.indptr, a.indices, blen)
        if out is not None:
            return out
    per_entry = blen[a.indices] if a.nnz else np.zeros(0, np.int64)
    cum = np.zeros(a.nnz + 1, dtype=np.int64)
    np.cumsum(per_entry, out=cum[1:])
    return cum[a.indptr[1:]] - cum[a.indptr[:-1]]


def spgemm_flops(a: BCSR, b: BCSR) -> int:
    """Total Gustavson flop count (Σ over A-nonzeros (i,j) of nnz(B row j))."""
    return int(row_flops(a, b).sum())


def require_int32_operands(*mats: BCSR) -> None:
    """Guard multiply *operands* to the int32 device index domain.

    Outputs above int32 nnz are supported (int64 host indptr, two-level
    assembly), but operand entry positions feed int32 device gathers —
    feeding a giant matrix back in must raise, not wrap (CLAUDE.md
    invariant; the reference's `int` indices wrap silently past INT_MAX).
    """
    for mat in mats:
        if mat.nnz > np.iinfo(np.int32).max:
            raise OverflowError(
                f"operand nnz {mat.nnz} exceeds the int32 device index "
                "domain; matrices this large are supported as outputs but "
                "not as multiply operands"
            )


def blocked_route(a: BCSR, b: BCSR) -> BCSR | None:
    """Opt-in MXU route for block-clustered products (ops/bsr.py).

    Sort-based engines pay per candidate slot; dense-block inputs have huge
    duplication factors (flops/output ≈ block fill · width), which is exactly
    where dense tile matmuls win — **device compute** measured 56× faster
    than the general engine on a 0.12-occupancy block-clustered matrix
    (benchmarks/results.jsonl, blocked-32k-b128; use ``BsrExecutor`` for
    repeated products).  NOT taken automatically by :func:`spgemm`: the
    one-shot path moves the dense tiles host↔device each call, which loses
    whenever that link is slow (this dev environment's tunnel moves
    ~25 MB/s).  Returns None if the input isn't block-clustered enough
    (per-touched-tile fill < 5%) or the structure is too large.
    """
    from .bsr import block_clustering_ratio, bsr_spgemm

    # only meaningful at scale — tiny shapes make the per-tile ratio noise
    if a.nnz < (1 << 17) or min(*a.shape, *b.shape) < 2048:
        return None
    min_fill = 0.05 * 128 * 128  # ≥5% tile fill: where dense MXU tiles win
    if block_clustering_ratio(a) < min_fill:
        return None
    if b is not a and block_clustering_ratio(b) < min_fill:
        return None
    from ..formats.bbcsr import BlockedBCSR

    blk_a = BlockedBCSR.from_bcsr(a, 128)
    blk_b = blk_a if b is a else BlockedBCSR.from_bcsr(b, 128)
    # bound pair count / output blocks so the dense tiles stay in memory
    pair_flops = spgemm_flops(blk_a.structure, blk_b.structure)
    if blk_a.n_blocks > 32768 or blk_b.n_blocks > 32768 or pair_flops > 65536:
        return None
    return bsr_spgemm(blk_a, blk_b).to_bcsr()


def _chunk_rows(
    rf: np.ndarray, chunk_flops: int, max_rows: int | None = None
) -> list[tuple[int, int]]:
    """Greedy contiguous row partition with ≤ chunk_flops per chunk (a single row
    exceeding the budget gets its own chunk).  This is the flop-balanced analogue
    of the reference's equal-rows tBlock split (final/SpGEMM_mpi_omp.c:83) — fixing
    its known load-imbalance weakness on skewed matrices."""
    n = len(rf)
    if n == 0:
        return [(0, 0)]
    cum = np.zeros(n + 1, np.int64)
    np.cumsum(rf, out=cum[1:])
    # one searchsorted per chunk instead of a Python pass over every row
    # (the row loop cost 26 ms at n=64K, ~0.4 s at n=1M)
    chunks = []
    start = 0
    while start < n:
        end = (
            int(np.searchsorted(cum, cum[start] + chunk_flops, side="right"))
            - 1
        )
        if cum[end] == cum[start] and end < n:
            # zero-flop prefix: the first flop-carrying row rides along even
            # when it alone exceeds the budget (a chunk is never all-padding)
            end += 1
        if max_rows is not None:
            end = min(end, start + max_rows)
        end = min(max(end, start + 1), n)
        chunks.append((start, end))
        start = end
    return chunks


def uniform_chunk_plan(
    a: BCSR,
    rf: np.ndarray,
    chunk_flops: int,
    n_cols: int | None = None,
    *,
    force_pack: bool = False,
) -> tuple[list[tuple[int, int]], int, int, int]:
    """Plan flop-bounded row chunks with **uniform padded shapes**.

    Every chunk is padded to the same ``(rows_pad, nnz_pad, flops_pad)`` so one
    XLA compilation serves all chunks — on TPU each distinct shape costs a
    ~20-40 s compile, so shape uniformity, not tight padding, wins.

    When ``n_cols`` is given, rows per chunk are additionally capped so (row, col)
    pairs pack into one int32 sort key inside the kernel (see :func:`packable`,
    ~30% sort saving) — but only when that cap does not inflate the chunk count
    (each extra chunk costs a full dispatch, ~10 ms through the device tunnel).
    """
    max_row_flops = int(rf.max()) if len(rf) else 0
    if max_row_flops > np.iinfo(np.int32).max:
        # a single output row's flop count must fit the kernel's int32 prefix
        # sums (a chunk is never smaller than one row)
        raise OverflowError(
            f"row flop count {max_row_flops} exceeds int32; "
            "int64 expansion is not implemented yet"
        )
    total = int(rf.sum())
    if total <= chunk_flops:
        base = [(0, a.n_rows)]
    else:
        base = _chunk_rows(rf, chunk_flops)
    chunks = base
    if n_cols is not None:
        shift = int(n_cols).bit_length()
        cap = 1 << max(0, 30 - shift)
        rows_max = max(r1 - r0 for r0, r1 in base)
        if rows_max > cap and cap >= 512:
            capped = _chunk_rows(rf, chunk_flops, cap)
            # force_pack: the caller dispatches all chunks in one device loop,
            # so extra chunks are free and the packed sort always pays.
            if force_pack or len(capped) <= len(base):
                chunks = capped
    rows_pad = pad_bucket(max(r1 - r0 for r0, r1 in chunks))
    nnz_pad = pad_bucket(
        max(int(a.indptr[r1] - a.indptr[r0]) for r0, r1 in chunks)
    )
    flops_pad = pad_bucket(max(int(rf[r0:r1].sum()) for r0, r1 in chunks))
    return chunks, rows_pad, nnz_pad, flops_pad


def pad_chunk_csr(
    mat: BCSR, r0: int, r1: int, rows_pad: int, nnz_pad: int, fill: int = 0
) -> tuple[np.ndarray, np.ndarray, int]:
    """Slice rows [r0, r1) of ``mat`` into uniformly padded local CSR arrays.

    Padding rows are empty (indptr tail repeats nnz); padding indices are
    ``fill``.  Returns (indptr [rows_pad+1], indices [nnz_pad], nnz_local).
    """
    nnz_local = int(mat.indptr[r1] - mat.indptr[r0])
    ptr = np.full(rows_pad + 1, nnz_local, np.int32)
    ptr[: r1 - r0 + 1] = mat.indptr[r0 : r1 + 1] - mat.indptr[r0]
    idx = np.full(nnz_pad, fill, np.int32)
    idx[:nnz_local] = mat.indices[mat.indptr[r0] : mat.indptr[r1]]
    return ptr, idx, nnz_local


# Compact-before-pull gate: below this padded size the straight padded pull
# is cheap even through a slow link and the extra kernel compiles aren't
# worth it.  One-shot huge results (e.g. R-MAT s18's ~3.7 GB padded stream
# through this environment's ~10-25 MB/s tunnel) are where it pays.
COMPACT_PULL_BYTES = 64 << 20
# Elements per paged device→host pull (32 MB of int32): large enough that
# the ~27 ms dispatch floor is noise next to the transfer itself.
PULL_PAGE = 1 << 23


@jax.jit
def compact_chunks(idx: jax.Array, nnz: jax.Array) -> jax.Array:
    """Pack per-chunk valid prefixes of a stacked ``[C, P]`` index array into
    one contiguous ``[C*P]`` stream (chunk-major; positions past the combined
    total are unspecified).

    Assembly pulls this dense prefix instead of the padded stack, shaving the
    per-chunk padding off the device→host transfer — the win is the padding
    ratio times the link cost.  One 1-D gather pass (~10 ns/elem,
    benchmarks/micro.jsonl) rather than a sort: the source position of output
    slot i is ``chunk(i)*P + i - offset[chunk(i)]`` with ``chunk(i)`` a
    searchsorted over the chunk-total prefix sums.
    """
    C, Pp = idx.shape
    nnz = nnz.astype(INT)
    cum = jnp.cumsum(nnz)
    off = cum - nnz
    i = jnp.arange(C * Pp, dtype=INT)
    chunk = jnp.minimum(
        jnp.searchsorted(cum, i, side="right").astype(INT), C - 1
    )
    src = chunk * Pp + (i - off[chunk])
    src = jnp.clip(src, 0, C * Pp - 1)
    return idx.reshape(-1)[src]


@functools.partial(jax.jit, static_argnames=("page",))
def _slice_page(flat: jax.Array, off: jax.Array, *, page: int) -> jax.Array:
    return jax.lax.dynamic_slice(flat, (off,), (page,))


@functools.partial(jax.jit, static_argnames=("size",))
def _slice_group(idx: jax.Array, g0: jax.Array, *, size: int) -> jax.Array:
    return jax.lax.dynamic_slice_in_dim(idx, g0, size, axis=0)


def pull_prefix(
    flat: jax.Array, total: int, page: int | None = None
) -> np.ndarray:
    """Pull ``flat[:total]`` to the host in fixed-size pages.

    One ``dynamic_slice`` kernel shape per (array length, page) pair serves
    every prefix length — no per-``total`` recompiles (compiles through this
    environment's tunnel cost 30-300 s, so slicing device-side with a
    ``total``-dependent shape would dwarf the transfer it saves).
    ``dynamic_slice`` clamps the start to keep the page in bounds; the final
    page is re-aligned host-side.
    """
    page = page or PULL_PAGE
    n = flat.shape[0]
    if total <= 0:
        return np.zeros(0, flat.dtype)
    if total >= n or page >= n:
        return np.asarray(flat)[:total].copy()
    out = np.empty(total, flat.dtype)
    for off in range(0, total, page):
        start = min(off, n - page)
        pg = np.asarray(_slice_page(flat, np.int32(start), page=page))
        take = min(page, total - off)
        out[off : off + take] = pg[off - start : off - start + take]
    return out


# One compaction pass's flat-size cap: compact_chunks flattens to [C*P] and
# gathers with int32 positions.  Bigger stacks compact in chunk groups.
_COMPACT_FLAT_MAX = (1 << 31) - 1

# Single-block compaction's HBM budget.  compact_chunks holds ~4 stack-sized
# int32 temporaries (positions, searchsorted chunk ids, gather sources, the
# gathered output) on top of the input stack, so a B-byte stack peaks near
# 5·B inside the one fused kernel.  R-MAT s18's 4.6 GB padded stack OOM'd a
# 16 GB chip this way (results.jsonl 2026-08-20); past this cap the stack
# compacts in chunk groups (same int32-domain machinery as the >2³¹ path)
# with G sized so each group's temporaries stay ~2 GB.
_COMPACT_BLOCK_BYTES = 1 << 31
_COMPACT_GROUP_BYTES = 1 << 29


def should_compact_pull(C: int, Pp: int, itemsize: int, total: int) -> bool:
    """Gate for compact-before-pull: the padded stack must be big enough to
    notice on the link and carry enough padding to pay for the device-side
    gather.  (Streams past int32 flat addressing compact group-wise.)"""
    if C * Pp * itemsize <= COMPACT_PULL_BYTES:
        return False
    return total <= 0.85 * C * Pp


def _compact_pull_block(idx, nnz_valid: np.ndarray) -> list[np.ndarray]:
    """Compact one ``[C, P]`` block (flat size < 2³¹) and pull its combined
    valid prefix; split back per chunk.  No profitability gate — callers
    gate on the whole stream."""
    C, Pp = idx.shape
    total = int(nnz_valid.sum())
    if C == 1:  # a single chunk's valid data is already a dense prefix
        return [pull_prefix(idx.reshape(-1), total)]
    flat = compact_chunks(idx, jnp.asarray(nnz_valid, np.int32))
    host = pull_prefix(flat, total)
    cuts = np.concatenate([[0], np.cumsum(nnz_valid.astype(np.int64))])
    return [host[cuts[i] : cuts[i + 1]] for i in range(C)]


def compact_pull(idx, nnz_valid: np.ndarray) -> list[np.ndarray] | None:
    """Compact a stacked padded ``[C, P]`` chunk-index device array and pull
    only the combined valid prefix; split back into per-chunk host arrays.

    Returns ``None`` when the straight padded pull is the better plan (small
    result or little padding) — callers fall back to ``np.asarray``.  Stacks
    past int32 flat addressing (>2³¹ elements — the gather's index domain)
    compact in uniform groups of chunks, at most two distinct group shapes
    so at most two extra kernel compiles.
    """
    C, Pp = idx.shape
    total = int(nnz_valid.sum())
    if not should_compact_pull(C, Pp, idx.dtype.itemsize, total):
        return None
    nbytes = C * Pp * idx.dtype.itemsize
    if C * Pp <= _COMPACT_FLAT_MAX and nbytes <= _COMPACT_BLOCK_BYTES:
        return _compact_pull_block(idx, nnz_valid)
    G = max(
        1,
        min(
            _COMPACT_FLAT_MAX // Pp,
            _COMPACT_GROUP_BYTES // (Pp * idx.dtype.itemsize),
        ),
    )
    parts: list[np.ndarray] = []
    for g0 in range(0, C, G):
        g1 = min(g0 + G, C)
        # traced start + static size: one compiled slice per group SHAPE
        # (<=2 — full groups and one remainder), not one per offset; static
        # slice starts would compile a program per group through the tunnel
        sub = _slice_group(idx, np.int32(g0), size=g1 - g0)
        parts.extend(_compact_pull_block(sub, nnz_valid[g0:g1]))
    return parts


def pull_chunk_prefixes(idx_dev, nnz_valid: np.ndarray) -> list[np.ndarray]:
    """Pull each chunk's valid prefix of a stacked ``[C, P]`` device array:
    compact-before-pull when profitable, else one padded pull sliced
    host-side (NEVER per-chunk device ``[:n]`` slices — each distinct length
    would compile a kernel)."""
    parts = compact_pull(idx_dev, nnz_valid)
    if parts is not None:
        return parts
    host = np.asarray(idx_dev)
    return [host[i, : int(nnz_valid[i])] for i in range(host.shape[0])]


def _stitch(chunks, rows_total, shape, run_chunk) -> BCSR:
    """Run ``run_chunk(r0, r1) -> (c_ptr, c_idx, nnz_c)`` per chunk and stitch the
    slices with a row-pointer prefix fix (≡ final/SpGEMM_mpi_omp.c:117-141)."""
    indptr_parts = [np.zeros(1, np.int64)]
    index_parts = []
    base = 0
    for r0, r1 in chunks:
        c_ptr, c_idx, nnz_c = run_chunk(r0, r1)
        nnz_c = int(nnz_c)
        index_parts.append(np.asarray(c_idx[:nnz_c]))
        local = np.asarray(c_ptr[1 : r1 - r0 + 1], dtype=np.int64)
        indptr_parts.append(local + base)
        base += nnz_c
    # Two-level output pointers: chunk-local int32 device pointers + int64
    # host bases; BCSR keeps int64 when the total exceeds the int32 domain
    # (the reference's `int` nnz would wrap here).
    indptr = np.concatenate(indptr_parts)
    indices = (
        np.concatenate(index_parts) if index_parts else np.zeros(0, np.int32)
    )
    return BCSR(indptr, indices, shape)


def _stitch_pipelined(chunks, rows_total, shape, dispatch, finish) -> BCSR:
    """:func:`_stitch` with a one-deep dispatch/finish pipeline.

    ``dispatch(r0, r1)`` queues one chunk's device work (async);
    ``finish(out)`` pulls and host-processes it (blocking).  Chunk i+1's
    compute is queued before chunk i's pull, so device→host transfer and
    host splits overlap device compute — the overlap the reference's
    compute-then-gather design lacked (SURVEY §5 "no overlap").
    """
    def prefetch(out):
        # start D2H copies at dispatch time (dispatch is async) for outputs
        # small enough that the straight copy is the pull plan anyway; big
        # padded outputs wait for finish's gated prefix paging
        for x in out:
            if hasattr(x, "copy_to_host_async") and x.nbytes <= COMPACT_PULL_BYTES:
                x.copy_to_host_async()
        return out

    parts: list = []
    prev = None
    for r0, r1 in chunks:
        cur = prefetch(dispatch(r0, r1))
        if prev is not None:
            parts.append(finish(prev))
        prev = cur
    parts.append(finish(prev))
    it = iter(parts)
    return _stitch(chunks, rows_total, shape, lambda r0, r1: next(it))


def pull_padded_tuple(c_ptr, c_idx, nnz_c) -> tuple[np.ndarray, np.ndarray, int]:
    """Pull one chunk's ``(indptr, indices, nnz)`` kernel output to the host.

    Blocks; slices the valid index prefix HOST-side (a device ``[:nnz]``
    slice would compile one kernel per distinct nnz — 30-300 s each through
    this environment's tunnel), paging only the prefix off the device for
    giant padded chunks."""
    nnz_i = int(nnz_c)
    if should_compact_pull(1, c_idx.shape[0], c_idx.dtype.itemsize, nnz_i):
        idx_host = pull_prefix(c_idx, nnz_i)
    else:
        idx_host = np.asarray(c_idx)[:nnz_i]
    return np.asarray(c_ptr), idx_host, nnz_i


class SpGEMMExecutor:
    """Pre-staged repeated C = A·B executor.

    Stages the chunk plan's device arrays once, so each :meth:`run` measures only
    device compute — the reference's benchmark protocol (matrix resident in RAM,
    time the multiply only; final/SpGEMM_mpi_omp.c:318-324).
    """

    def __init__(self, a: BCSR, b: BCSR, *, chunk_flops: int | None = None):
        if a.n_cols != b.n_rows:
            raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
        require_int32_operands(a, b)
        self.shape = (a.n_rows, b.n_cols)
        chunk_flops = chunk_flops or DEFAULT_CHUNK_FLOPS
        rf = row_flops(a, b)
        # force_pack measured slower here: 8 packed 1-key chunks in one lax.map
        # dispatch ran 0.41 s vs 0.29 s for one unpacked 2-key kernel — chunk
        # splitting costs more than the cheaper sorts save.
        self.chunks, rows_pad, nnz_pad, self.flops_pad = uniform_chunk_plan(
            a, rf, chunk_flops, b.n_cols
        )
        self.n_cols = b.n_cols
        self.b_indptr = jnp.asarray(b.indptr)
        self.b_indices = jnp.asarray(b.indices)
        ptrs, idxs, nnzs = [], [], []
        for r0, r1 in self.chunks:
            ptr, idx, nnz_local = pad_chunk_csr(a, r0, r1, rows_pad, nnz_pad)
            ptrs.append(ptr)
            idxs.append(idx)
            nnzs.append(nnz_local)
        self.a_ptr = jnp.asarray(np.stack(ptrs))
        self.a_idx = jnp.asarray(np.stack(idxs))
        self.a_nnz = jnp.asarray(np.asarray(nnzs, np.int32))

        # All chunks execute in ONE dispatch via a sequential on-device loop
        # (lax.map): per-chunk host dispatches cost ~10 ms each through the
        # device tunnel, and the loop body is compiled once.  Row pointers
        # ride as embedded separators (esc_spgemm_seps; assemble splits).
        def _mapped(a_ptr, a_idx, a_nnz, b_ptr, b_idx):
            return jax.lax.map(
                lambda t: esc_spgemm_seps(
                    t[0], t[1], t[2], b_ptr, b_idx,
                    n_cols=self.n_cols, flops_pad=self.flops_pad,
                ),
                (a_ptr, a_idx, a_nnz),
            )

        self._fn = jax.jit(_mapped)
        self._rows_pad = rows_pad

    def run(self):
        """One full multiply: stacked (c_indices, nnz_c) device arrays (row
        pointers embedded as separators; assemble() splits them off)."""
        return self._fn(
            self.a_ptr, self.a_idx, self.a_nnz, self.b_indptr, self.b_indices
        )

    def assemble(self, outputs) -> BCSR:
        idx_dev, nnz_dev = outputs
        nnz_c = np.asarray(nnz_dev)
        chunk_idx = pull_chunk_prefixes(idx_dev, nnz_c.astype(np.int64))
        chunks = self.chunks
        it = iter(range(len(chunks)))
        return _stitch(
            chunks,
            self.shape[0],
            self.shape,
            lambda r0, r1: (
                lambda s: split_seps(
                    chunk_idx[s], int(nnz_c[s]), self._rows_pad, self.n_cols
                )
            )(next(it)),
        )


# A single output row whose Gustavson flop count exceeds this is computed by
# the column-windowed fallback (``_spgemm_giant``) instead of the chunked
# engines, whose per-chunk prefix sums live in the int32 domain.  Module-level
# so tests can lower it (exercising the real 2^30 takes minutes of expansion).
GIANT_ROW_FLOPS = 1 << 30


def _spgemm_giant(a: BCSR, b: BCSR, rf: np.ndarray, chunk_flops) -> BCSR:
    """C = A·B when some single rows exceed the per-chunk int32 flop domain.

    The reference grows its output with realloc so any row size works
    (final/SpGEMM_mpi_omp.c:28-31); the static-shape engines here cannot.
    Instead each giant row's A-entries are split into flop-bounded windows,
    every window runs as a 1-row product through the normal engines, and the
    window results are unioned on the host (a window partitions B's rows, so
    the same output column can surface in several windows).  Non-giant rows
    take the standard path untouched.
    """
    budget = GIANT_ROW_FLOPS
    giant = np.flatnonzero(rf > budget)
    # rest-matrix: giant rows emptied, everything else verbatim
    lens = np.diff(a.indptr).astype(np.int64)
    lens_rest = lens.copy()
    lens_rest[giant] = 0
    keep = np.ones(a.nnz, bool)
    for i in giant:
        keep[a.indptr[i] : a.indptr[i + 1]] = False
    indptr_rest = np.zeros(a.n_rows + 1, np.int64)
    np.cumsum(lens_rest, out=indptr_rest[1:])
    a_rest = BCSR(indptr_rest, a.indices[keep], a.shape)
    c_rest = spgemm(a_rest, b, chunk_flops=chunk_flops)

    blen = np.diff(b.indptr).astype(np.int64)
    giant_rows: dict[int, np.ndarray] = {}
    for i in giant:
        entries = a.indices[a.indptr[i] : a.indptr[i + 1]]
        w = blen[entries]
        csum = np.cumsum(w)
        parts = []
        lo = 0
        while lo < len(entries):
            # largest window starting at lo with total flops <= budget
            hi = int(np.searchsorted(csum, (csum[lo - 1] if lo else 0) + budget, side="right"))
            if hi <= lo:  # one entry alone exceeds the budget: its result is
                # exactly that B row's distinct columns — host set-union
                parts.append(np.unique(b.indices[b.indptr[entries[lo]] : b.indptr[entries[lo] + 1]]))
                lo += 1
                continue
            sub = BCSR(
                np.array([0, hi - lo], np.int64),
                entries[lo:hi],
                (1, b.n_rows),
            )
            parts.append(spgemm(sub, b, chunk_flops=chunk_flops).indices)
            lo = hi
        giant_rows[int(i)] = (
            np.unique(np.concatenate(parts)) if len(parts) > 1 else parts[0]
        )

    # splice the giant rows into the rest-result
    out_lens = np.diff(c_rest.indptr).astype(np.int64)
    for i, cols in giant_rows.items():
        out_lens[i] = len(cols)
    indptr = np.zeros(a.n_rows + 1, np.int64)
    np.cumsum(out_lens, out=indptr[1:])
    indices = np.empty(int(indptr[-1]), np.int32)
    # bulk-copy the untouched span structure row by row is O(n) python for
    # many giants, but giants are pathological and few; copy contiguous runs
    prev_end = 0
    src_pos = 0
    cursor = 0
    bounds = sorted(giant_rows)
    for i in bounds:
        run = int(c_rest.indptr[i]) - src_pos
        indices[cursor : cursor + run] = c_rest.indices[src_pos : src_pos + run]
        cursor += run
        src_pos = int(c_rest.indptr[i + 1])  # skip the (empty) giant row
        cols = giant_rows[i]
        indices[cursor : cursor + len(cols)] = cols
        cursor += len(cols)
    run = c_rest.nnz - src_pos
    indices[cursor : cursor + run] = c_rest.indices[src_pos:]
    return BCSR(indptr, indices, (a.n_rows, b.n_cols))


def spgemm(
    a: BCSR,
    b: BCSR,
    *,
    chunk_flops: int | None = None,
) -> BCSR:
    """Boolean SpGEMM structure C = A·B on the default JAX device.

    Engine-auto entry point: uses the sliced-ELL executor (ops/ell.py — the
    fast path, measured ~4x over ESC on TPU) whenever its padded expansion
    fits the device budget, otherwise the flop-chunked ESC driver below.
    Passing ``chunk_flops`` explicitly forces the ESC path (callers tuning
    chunking want the chunked engine).
    """
    if a.n_cols != b.n_rows:
        raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
    require_int32_operands(a, b)
    n, m = a.n_rows, b.n_cols
    if a.nnz == 0 or b.nnz == 0:
        return BCSR(np.zeros(n + 1, np.int32), np.zeros(0, np.int32), (n, m))

    rf_total = row_flops(a, b)
    if len(rf_total) and int(rf_total.max()) > GIANT_ROW_FLOPS:
        return _spgemm_giant(a, b, rf_total, chunk_flops)

    if chunk_flops is None:
        # Small-flop inputs (e.g. the reference's own validity fixture,
        # final/Makefile:11-12) lose to any host CPU under the ~27 ms
        # device dispatch floor — run them on the host engine instead.
        from .host import HOST_MAX_FLOPS, host_spgemm

        if int(rf_total.sum()) <= HOST_MAX_FLOPS:
            return host_spgemm(a, b)

        # One-shot calls stay on the unrolled plan: the batched 2-D engine's
        # run() gain (0.17->0.14 s at n=5M) is dwarfed by its bigger host
        # plan cost (~7 s vs ~3 s there) — batched pays off for STAGED use
        # (auto_executor / EllSpGEMMExecutor(batched=True)), where the plan
        # amortises over repeated run() calls.
        from .ell import AUTO_ELL_MAX_SLOTS, cached_executor

        try:
            # allow_bsr: block-clustered products take the staged MXU
            # engine (13x on the blocked canonical); repeated calls on the
            # same operands reuse the staged tiles through the cache
            ex = cached_executor(a, b, allow_bsr=True)
            if getattr(ex, "engine", None) == "bsr":
                return ex.assemble(ex.run())
            if ex.resident_slots <= AUTO_ELL_MAX_SLOTS:
                return ex.assemble(ex.run())
            # beyond the resident budget the chunked ESC path below wins on
            # this environment (device->host streaming through the compile
            # tunnel measured ~25 MB/s; run_assemble_streaming exists for
            # directly-attached hosts)
        except OverflowError:
            pass

    chunk_flops = chunk_flops or DEFAULT_CHUNK_FLOPS
    rf = row_flops(a, b)
    chunks, rows_pad, nnz_pad, flops_pad = uniform_chunk_plan(a, rf, chunk_flops, m)
    b_indptr = jnp.asarray(b.indptr)
    b_indices = jnp.asarray(b.indices)

    def dispatch(r0, r1):
        ptr, idx, nnz_local = pad_chunk_csr(a, r0, r1, rows_pad, nnz_pad)
        c_idx, nnz_c = spgemm_padded_seps(
            jnp.asarray(ptr),
            jnp.asarray(idx),
            jnp.asarray(nnz_local, INT),
            b_indptr,
            b_indices,
            n_cols=m,
            flops_pad=flops_pad,
        )
        return c_idx, nnz_c

    def finish(out):
        c_idx, nnz_c = out
        nnz_i = int(nnz_c)
        # giant chunks page only the valid prefix off the device (no device
        # reshape/compaction — one chunk's valid data is already a prefix)
        if should_compact_pull(1, c_idx.shape[0], 4, nnz_i):
            host = pull_prefix(c_idx, nnz_i)
        else:
            host = np.asarray(c_idx)
        return split_seps(host, nnz_i, rows_pad, m)

    # Through this environment's tunnel the pipeline's effect is a wash
    # (pulls dominate at ~13-150 MB/s with huge run-to-run variance —
    # benchmarks/ab_pipeline.py); the win case is a directly-attached host
    # where per-chunk compute and D2H are comparable.
    return _stitch_pipelined(chunks, n, (n, m), dispatch, finish)
