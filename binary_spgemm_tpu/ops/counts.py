"""Counting SpGEMM: structure plus per-entry multiplicities.

For 0/1 operands the multiplicity of output entry (i, j) — how many expansion
candidates collapsed into it — IS the numeric value of (A·B)[i, j], i.e.
|{k : A[i,k] ∧ B[k,j]}|.  The reference has no numeric path at all (its
semiring is pure OR), but the multiplicities fall out of this engine's
sort-based compression almost for free: an exclusive running count of valid
candidates rides the compaction sort as a payload, and each surviving (first)
candidate's count is the payload difference to the next survivor.

The flagship consumer is :func:`triangle_count_device`: triangles(G) =
Σ_{(i,j)∈A} |N(i) ∩ N(j)| / 6 = the masked-by-A sum of A·A's multiplicities.
That sum needs no output arrays at all — one tagged sort (mask entries sort
first within an equal (row, col) run, ≡ ``sort_compress_masked``'s join) and
a forward-fill marks every candidate whose run is masked; the kernel returns
ONE scalar per chunk, so nothing rides the slow device→host link.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .bitonic import sort_rows as sort_rows_1key
import numpy as np

from ..formats.bcsr import BCSR
from .spgemm import (
    INT,
    DEFAULT_CHUNK_FLOPS,
    _histogram_indptr_wins,
    _indptr_from_sorted_rows,
    _row_ids,
    expand_pairs,
    pad_bucket,
    pad_chunk_csr,
    packable,
    row_flops,
    uniform_chunk_plan,
)

__all__ = [
    "spgemm_counts",
    "masked_spgemm_counts",
    "triangle_count_device",
    "sort_compress_counts",
    "sort_compress_counts_seps_2d",
    "masked_counts_compress",
    "masked_counts_compress_seps_2d",
    "masked_counts_sum",
    "masked_counts_sum_2d",
]


def sort_compress_counts(
    row: jax.Array, col: jax.Array, n_rows: int, n_cols: int
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """:func:`sort_compress` that also returns per-entry multiplicities.

    ``q`` = exclusive running count of valid candidates rides the compaction
    sort as a payload attached to each surviving (first-occurrence) entry;
    because survivors stay in key order, ``count_i = q_{i+1} - q_i`` (the
    last survivor closes against the total).  Costs one payload on the
    second sort (~+25%, micro: sort1key1payload 3.56 vs sort1 2.71 ns/elem)
    plus one cumsum.

    Returns ``(c_indptr, c_indices, c_counts, nnz_c)``; ``c_counts`` is
    int32 (an entry's multiplicity is bounded by the inner dimension).
    """
    if packable(n_rows, n_cols):
        shift = int(n_cols).bit_length()
        key = (row << shift) | col
        key_s = jax.lax.sort((key,), is_stable=False)[0]
        valid = key_s < (n_rows << shift)
        q = jnp.cumsum(valid.astype(INT)) - valid.astype(INT)  # exclusive
        total = jnp.sum(valid, dtype=INT)
        prev = jnp.concatenate([jnp.full((1,), -1, INT), key_s[:-1]])
        keep = (key_s != prev) & valid
        nnz_c = jnp.sum(keep, dtype=INT)
        demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max)
        c_keys, qc = jax.lax.sort((demoted, q), num_keys=1, is_stable=False)
        c_indices = c_keys & ((1 << shift) - 1)
        c_rows_for_ptr = jax.lax.shift_right_logical(c_keys, shift)
        mark = jnp.arange(key_s.shape[0], dtype=INT)
        nxt = jnp.where(mark + 1 < nnz_c, jnp.roll(qc, -1), total)
        c_counts = jnp.where(mark < nnz_c, nxt - qc, 0)
        if _histogram_indptr_wins(n_rows, row.shape[0]):
            c_indptr = _indptr_from_sorted_rows(c_rows_for_ptr, n_rows)
        else:
            c_indptr = jnp.searchsorted(
                c_keys, jnp.arange(n_rows + 1, dtype=INT) << shift,
                side="left",
            ).astype(INT)
        return c_indptr, c_indices, c_counts, nnz_c

    row_s, col_s = jax.lax.sort((row, col), num_keys=2, is_stable=False)
    valid = row_s < n_rows
    q = jnp.cumsum(valid.astype(INT)) - valid.astype(INT)
    total = jnp.sum(valid, dtype=INT)
    prev_row = jnp.concatenate([jnp.full((1,), -1, INT), row_s[:-1]])
    prev_col = jnp.concatenate([jnp.full((1,), -1, INT), col_s[:-1]])
    keep = ((row_s != prev_row) | (col_s != prev_col)) & valid
    nnz_c = jnp.sum(keep, dtype=INT)
    demoted_r = jnp.where(keep, row_s, n_rows)
    demoted_c = jnp.where(keep, col_s, n_cols)
    c_rows, c_indices, qc = jax.lax.sort(
        (demoted_r, demoted_c, q), num_keys=2, is_stable=False
    )
    mark = jnp.arange(row_s.shape[0], dtype=INT)
    nxt = jnp.where(mark + 1 < nnz_c, jnp.roll(qc, -1), total)
    c_counts = jnp.where(mark < nnz_c, nxt - qc, 0)
    if _histogram_indptr_wins(n_rows, row.shape[0]):
        c_indptr = _indptr_from_sorted_rows(c_rows, n_rows)
    else:
        c_indptr = jnp.searchsorted(
            c_rows, jnp.arange(n_rows + 1, dtype=INT), side="left"
        ).astype(INT)
    return c_indptr, c_indices, c_counts, nnz_c


def sort_compress_counts_seps_2d_keys(
    key: jax.Array, n_rows: int, n_cols: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Packed branch of :func:`sort_compress_counts_seps_2d` taking the
    candidate stream as PRE-PACKED keys (``(row << bl) | col`` — assembled
    directly by `ops/ell.py::_assemble_stream_2d(shift=...)`, no pair
    streams or pack pass).  Bit-identical to the pair form."""
    k, L = key.shape
    mark = jnp.arange(L, dtype=INT)[None, :]
    shift = int(n_cols).bit_length()
    key_s = sort_rows_1key(key)
    valid = key_s < (n_rows << shift)  # separators valid, padding not
    q = jnp.cumsum(valid.astype(INT), axis=1) - valid.astype(INT)
    total = jnp.sum(valid, axis=1, dtype=INT)[:, None]
    prev = jnp.concatenate(
        [jnp.full((k, 1), -1, INT), key_s[:, :-1]], axis=1
    )
    keep = (key_s != prev) & valid
    nnz_c = jnp.sum(keep, axis=1, dtype=INT)
    demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max)
    c_keys, qc = jax.lax.sort(
        (demoted, q), dimension=1, num_keys=1, is_stable=False
    )
    nxt = jnp.where(
        mark + 1 < nnz_c[:, None], jnp.roll(qc, -1, axis=1), total
    )
    c_counts = jnp.where(mark < nnz_c[:, None], nxt - qc, 0)
    return c_keys & ((1 << shift) - 1), c_counts, nnz_c


def sort_compress_counts_seps_2d(
    row: jax.Array, col: jax.Array, n_rows: int, n_cols: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched :func:`sort_compress_counts` with **embedded row separators**:
    ``row``/``col`` are ``[k, L]`` per-chunk candidate streams (one synthetic
    ``(r, n_cols)`` separator per chunk row appended by the caller); the
    payload sorts run along axis -1.

    Separators are unique within their chunk, so they survive compaction
    with a (dropped) multiplicity of 1 — the host splits them off the index
    stream and deletes the matching count slots
    (``EllSpGEMMExecutor._assemble_seps_batch``).  Returns stacked
    ``(c_indices [k, L], c_counts [k, L], nnz [k])`` where nnz includes the
    separators.
    """
    k, L = row.shape
    mark = jnp.arange(L, dtype=INT)[None, :]
    if packable(n_rows, n_cols):
        shift = int(n_cols).bit_length()
        return sort_compress_counts_seps_2d_keys(
            (row << shift) | col, n_rows, n_cols
        )

    row_s, col_s = jax.lax.sort(
        (row, col), dimension=1, num_keys=2, is_stable=False
    )
    valid = row_s < n_rows
    q = jnp.cumsum(valid.astype(INT), axis=1) - valid.astype(INT)
    total = jnp.sum(valid, axis=1, dtype=INT)[:, None]
    pad1 = jnp.full((k, 1), -1, INT)
    prev_row = jnp.concatenate([pad1, row_s[:, :-1]], axis=1)
    prev_col = jnp.concatenate([pad1, col_s[:, :-1]], axis=1)
    keep = ((row_s != prev_row) | (col_s != prev_col)) & valid
    nnz_c = jnp.sum(keep, axis=1, dtype=INT)
    demoted_r = jnp.where(keep, row_s, n_rows)
    demoted_c = jnp.where(keep, col_s, n_cols)
    _, c_indices, qc = jax.lax.sort(
        (demoted_r, demoted_c, q), dimension=1, num_keys=2, is_stable=False
    )
    nxt = jnp.where(
        mark + 1 < nnz_c[:, None], jnp.roll(qc, -1, axis=1), total
    )
    c_counts = jnp.where(mark < nnz_c[:, None], nxt - qc, 0)
    return c_indices, c_counts, nnz_c


def masked_counts_compress_seps_2d_keys(
    key: jax.Array,
    f_row: jax.Array,
    f_col: jax.Array,
    n_rows: int,
    n_cols: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Packed branch of :func:`masked_counts_compress_seps_2d` taking the
    candidate stream as PRE-PACKED plain keys (``(row << bl) | col``);
    stage 2's tagged join key derives as ``(u_keys << 1) | 1``.
    Bit-identical to the pair form (caller checks
    ``packable(n_rows, 2 * n_cols + 1)``)."""
    k, L = key.shape
    mark = jnp.arange(L, dtype=INT)[None, :]
    bl = int(n_cols).bit_length()
    key_s = sort_rows_1key(key)
    valid = key_s < (n_rows << bl)
    q = jnp.cumsum(valid.astype(INT), axis=1) - valid.astype(INT)
    total = jnp.sum(valid, axis=1, dtype=INT)[:, None]
    prev = jnp.concatenate(
        [jnp.full((k, 1), -1, INT), key_s[:, :-1]], axis=1
    )
    keep = (key_s != prev) & valid
    n_uniq = jnp.sum(keep, axis=1, dtype=INT)
    demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max >> 1)
    u_keys, qc = jax.lax.sort(
        (demoted, q), dimension=1, num_keys=1, is_stable=False
    )
    nxt = jnp.where(
        mark + 1 < n_uniq[:, None], jnp.roll(qc, -1, axis=1), total
    )
    u_counts = jnp.where(mark < n_uniq[:, None], nxt - qc, 0)
    # stage 2: tagged join against the mask, counts as payload
    jk = jnp.concatenate(
        [(u_keys << 1) | 1, (((f_row << bl) | f_col) << 1)], axis=1
    )
    jc = jnp.concatenate([u_counts, jnp.zeros(f_row.shape, INT)], axis=1)
    jk_s, jc_s = jax.lax.sort(
        (jk, jc), dimension=1, num_keys=1, is_stable=False
    )
    jprev = jnp.concatenate(
        [jnp.full((k, 1), -2, INT), jk_s[:, :-1]], axis=1
    )
    is_cand = (jk_s & 1) == 1
    in_range = jk_s < ((n_rows << (bl + 1)) | 1)
    is_sep = is_cand & in_range & (
        ((jk_s >> 1) & ((1 << bl) - 1)) == n_cols
    )
    keep2 = (is_cand & (jprev == (jk_s & ~1)) & in_range) | is_sep
    nnz_c = jnp.sum(keep2, axis=1, dtype=INT)
    dem2 = jnp.where(keep2, jk_s, jnp.iinfo(jnp.int32).max)
    c_keys, c_counts = jax.lax.sort(
        (dem2, jnp.where(keep2, jc_s, 0)),
        dimension=1, num_keys=1, is_stable=False,
    )
    return (c_keys >> 1) & ((1 << bl) - 1), c_counts, nnz_c


def masked_counts_compress_seps_2d(
    row: jax.Array,
    col: jax.Array,
    f_row: jax.Array,
    f_col: jax.Array,
    n_rows: int,
    n_cols: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched :func:`masked_counts_compress` with embedded row separators:
    stage 1 is :func:`sort_compress_counts_seps_2d`'s compression, stage 2 a
    tagged join against the mask along axis -1; separators survive the join
    unconditionally (they have no mask pair) and are split off host-side.
    ``f_row``/``f_col`` are ``[k, Pf]`` mask pairs pre-sentineled to
    ``(n_rows, n_cols)``.  Returns ``(c_indices, c_counts, nnz)`` stacked.
    """
    k, L = row.shape
    if packable(n_rows, 2 * n_cols + 1):
        bl = int(n_cols).bit_length()
        return masked_counts_compress_seps_2d_keys(
            (row << bl) | col, f_row, f_col, n_rows, n_cols
        )

    # general path: 2-key counts compression (rows kept explicit so the join
    # can re-key on them), then a 3-key tagged join against the mask
    mark = jnp.arange(L, dtype=INT)[None, :]
    row_s, col_s = jax.lax.sort(
        (row, col), dimension=1, num_keys=2, is_stable=False
    )
    valid = row_s < n_rows
    q = jnp.cumsum(valid.astype(INT), axis=1) - valid.astype(INT)
    total = jnp.sum(valid, axis=1, dtype=INT)[:, None]
    pad1 = jnp.full((k, 1), -1, INT)
    keep = (
        (row_s != jnp.concatenate([pad1, row_s[:, :-1]], axis=1))
        | (col_s != jnp.concatenate([pad1, col_s[:, :-1]], axis=1))
    ) & valid
    n_uniq = jnp.sum(keep, axis=1, dtype=INT)
    u_rows, u_cols, qc = jax.lax.sort(
        (
            jnp.where(keep, row_s, n_rows),
            jnp.where(keep, col_s, n_cols),
            q,
        ),
        dimension=1, num_keys=2, is_stable=False,
    )
    nxt = jnp.where(
        mark + 1 < n_uniq[:, None], jnp.roll(qc, -1, axis=1), total
    )
    u_cnt = jnp.where(mark < n_uniq[:, None], nxt - qc, 0)
    rows = jnp.concatenate([u_rows, f_row], axis=1)
    cols = jnp.concatenate([u_cols, f_col], axis=1)
    tags = jnp.concatenate(
        [jnp.ones(u_rows.shape, INT), jnp.zeros(f_row.shape, INT)], axis=1
    )
    cnts = jnp.concatenate([u_cnt, jnp.zeros(f_row.shape, INT)], axis=1)
    rs, cs, ts, ks = jax.lax.sort(
        (rows, cols, tags, cnts), dimension=1, num_keys=3, is_stable=False
    )
    pr = jnp.concatenate([pad1, rs[:, :-1]], axis=1)
    pc = jnp.concatenate([pad1, cs[:, :-1]], axis=1)
    pt = jnp.concatenate([pad1, ts[:, :-1]], axis=1)
    in_range = rs < n_rows
    is_sep = (ts == 1) & (cs == n_cols) & in_range
    keep2 = (
        (ts == 1) & (pr == rs) & (pc == cs) & (pt == 0) & in_range
    ) | is_sep
    nnz_c = jnp.sum(keep2, axis=1, dtype=INT)
    _, c_indices, c_counts = jax.lax.sort(
        (
            jnp.where(keep2, rs, n_rows),
            jnp.where(keep2, cs, n_cols),
            jnp.where(keep2, ks, 0),
        ),
        dimension=1, num_keys=2, is_stable=False,
    )
    return c_indices, c_counts, nnz_c


def _masked_run_marks_2d(is_mask, new):
    """Batched :func:`_masked_run_marks_1d`: runs along axis -1."""
    k, n = is_mask.shape
    pos = jnp.broadcast_to(jnp.arange(n, dtype=INT)[None, :], (k, n))
    m_all = jax.lax.cummax(jnp.where(new, pos, -1), axis=1)
    m_mask = jax.lax.cummax(jnp.where(new & is_mask, pos, -1), axis=1)
    return (m_mask == m_all) & (m_all >= 0)


def masked_counts_sum_2d_keys(
    key: jax.Array,
    f_row: jax.Array,
    f_col: jax.Array,
    n_rows: int,
    n_cols: int,
) -> jax.Array:
    """Packed branch of :func:`masked_counts_sum_2d` taking PRE-PACKED
    plain candidate keys; the tagged key derives as ``(key << 1) | 1``.
    Bit-identical to the pair form."""
    k = key.shape[0]
    shift = int(n_cols).bit_length() + 1
    keys = jnp.concatenate(
        [
            (key << 1) | 1,
            (f_row << shift) | (f_col << 1),
        ],
        axis=1,
    )
    key_s = sort_rows_1key(keys)
    is_mask = (key_s & 1) == 0
    prev = jnp.concatenate(
        [jnp.full((k, 1), -2, INT), key_s[:, :-1]], axis=1
    )
    new = (key_s >> 1) != (prev >> 1)
    masked_run = _masked_run_marks_2d(is_mask, new)
    counted = (
        (~is_mask) & masked_run & (key_s < (n_rows << shift))
    )
    return jnp.sum(counted, axis=1, dtype=INT)


def masked_counts_sum_2d(
    row: jax.Array,
    col: jax.Array,
    f_row: jax.Array,
    f_col: jax.Array,
    n_rows: int,
    n_cols: int,
) -> jax.Array:
    """Batched :func:`masked_counts_sum`: one int32 wedge-sum scalar per
    chunk row of the ``[k, L]`` candidate stream (mask pairs ``[k, Pf]``
    pre-sentineled).  Row separators in the stream are harmless — their
    ``n_cols`` column never matches a mask pair."""
    if packable(n_rows, 2 * n_cols + 1):
        bl = int(n_cols).bit_length()
        return masked_counts_sum_2d_keys(
            (row << bl) | col, f_row, f_col, n_rows, n_cols
        )

    k = row.shape[0]
    rows = jnp.concatenate([row, f_row], axis=1)
    cols = jnp.concatenate([col, f_col], axis=1)
    tags = jnp.concatenate(
        [jnp.ones(row.shape, INT), jnp.zeros(f_row.shape, INT)], axis=1
    )
    rows_s, cols_s, tags_s = jax.lax.sort(
        (rows, cols, tags), dimension=1, num_keys=3, is_stable=False
    )
    is_mask = tags_s == 0
    pad1 = jnp.full((k, 1), -1, INT)
    new = (rows_s != jnp.concatenate([pad1, rows_s[:, :-1]], axis=1)) | (
        cols_s != jnp.concatenate([pad1, cols_s[:, :-1]], axis=1)
    )
    masked_run = _masked_run_marks_2d(is_mask, new)
    counted = (~is_mask) & masked_run & (rows_s < n_rows)
    return jnp.sum(counted, axis=1, dtype=INT)


@functools.partial(jax.jit, static_argnames=("n_cols", "flops_pad"))
def _counts_padded(
    a_indptr, a_indices, a_nnz, b_indptr, b_indices, *, n_cols, flops_pad
):
    n_rows = a_indptr.shape[0] - 1
    row, col = expand_pairs(
        a_indptr, a_indices, a_nnz, b_indptr, b_indices,
        n_cols=n_cols, flops_pad=flops_pad,
    )
    return sort_compress_counts(row, col, n_rows, n_cols)


def _masked_run_marks_1d(is_mask, new):
    """``counted``-precursor: for each position of a sorted tagged stream,
    is the latest (row, col)-run start a mask entry?

    The stream is SORTED, so the latest run start at-or-before a position
    is the maximum over positions of run starts.  TWO plain-position
    cummaxes (all run starts; mask run starts) answer it without packing:
    the latest run start is a mask entry iff the two maxima coincide.
    (A single cummax of ``2*pos | is_mask`` would wrap int32 past 2^30
    positions — lengths the routers admit — and jnp.int64 silently
    canonicalizes back to int32 with x64 disabled, so no packed form is
    safe.)
    Replaces the generic pair-scan forward fill
    (``_forward_fill_last``), whose associative_scan lowering measured
    pathologically slow through this environment's remote XLA compile
    (>35 min for one [32K, 1.5K] shape vs seconds for cummax).
    """
    n = is_mask.shape[0]
    pos = jnp.arange(n, dtype=INT)
    m_all = jax.lax.cummax(jnp.where(new, pos, -1))
    m_mask = jax.lax.cummax(jnp.where(new & is_mask, pos, -1))
    return (m_mask == m_all) & (m_all >= 0)


def masked_counts_sum(
    row, col, f_indptr, f_indices, f_nnz, n_rows: int, n_cols: int
):
    """Σ over mask entries (i, j) of multiplicity of candidate pair (i, j) —
    one traced int32 scalar (composable: also the per-shard kernel of
    :func:`..parallel.dist_spgemm.dist_triangle_count`).

    One tagged sort (mask pairs sort before candidates within an equal
    (row, col) run, ≡ ``sort_compress_masked``); a cummax over run-start
    tags marks every candidate belonging to a masked run (a run containing
    a mask entry starts with it, since mask sorts first), and the answer is
    the count of marked candidates.  Bounded by the candidate stream's
    padded length, so int32 cannot overflow per call.
    """
    pf = f_indices.shape[0]
    f_row = _row_ids(f_indptr, pf)
    f_valid = jnp.arange(pf, dtype=INT) < f_nnz
    f_row = jnp.where(f_valid, f_row, n_rows)
    f_col = jnp.where(f_valid, f_indices, n_cols)

    if packable(n_rows, 2 * n_cols + 1):
        shift = int(n_cols).bit_length() + 1
        keys = jnp.concatenate(
            [((row << shift) | (col << 1)) | 1, (f_row << shift) | (f_col << 1)]
        )
        key_s = jax.lax.sort((keys,), is_stable=False)[0]
        is_mask = (key_s & 1) == 0
        prev = jnp.concatenate([jnp.full((1,), -2, INT), key_s[:-1]])
        new = (key_s >> 1) != (prev >> 1)  # (row, col)-run starts
        masked_run = _masked_run_marks_1d(is_mask, new)
        counted = (
            (~is_mask) & masked_run & (key_s < (n_rows << shift))
        )
        return jnp.sum(counted, dtype=INT)

    rows = jnp.concatenate([row, f_row])
    cols = jnp.concatenate([col, f_col])
    tags = jnp.concatenate(
        [jnp.ones(row.shape[0], INT), jnp.zeros(pf, INT)]
    )
    rows_s, cols_s, tags_s = jax.lax.sort(
        (rows, cols, tags), num_keys=3, is_stable=False
    )
    is_mask = tags_s == 0
    prev_r = jnp.concatenate([jnp.full((1,), -1, INT), rows_s[:-1]])
    prev_c = jnp.concatenate([jnp.full((1,), -1, INT), cols_s[:-1]])
    new = (rows_s != prev_r) | (cols_s != prev_c)
    masked_run = _masked_run_marks_1d(is_mask, new)
    counted = (~is_mask) & masked_run & (rows_s < n_rows)
    return jnp.sum(counted, dtype=INT)


@functools.partial(jax.jit, static_argnames=("n_cols", "flops_pad"))
def _masked_counts_sum_padded(
    f_indptr,
    f_indices,
    f_nnz,
    a_indptr,
    a_indices,
    a_nnz,
    b_indptr,
    b_indices,
    *,
    n_cols,
    flops_pad,
):
    """Jitted one-chunk wrapper: ESC expansion + :func:`masked_counts_sum`."""
    n_rows = a_indptr.shape[0] - 1
    row, col = expand_pairs(
        a_indptr, a_indices, a_nnz, b_indptr, b_indices,
        n_cols=n_cols, flops_pad=flops_pad,
    )
    return masked_counts_sum(
        row, col, f_indptr, f_indices, f_nnz, n_rows, n_cols
    )


@functools.partial(jax.jit, static_argnames=("n_cols", "flops_pad"))
def _masked_counts_padded(
    f_indptr,
    f_indices,
    f_nnz,
    a_indptr,
    a_indices,
    a_nnz,
    b_indptr,
    b_indices,
    *,
    n_cols,
    flops_pad,
):
    """C = F .* (A·B) structure plus multiplicities (common-neighbor counts
    over the mask's support): ESC expansion + :func:`masked_counts_compress`.
    Returns ``(c_indptr, c_indices, c_counts, nnz_c)`` where the padded
    arrays have ``flops_pad + len(f_indices)`` slots.
    """
    n_rows = a_indptr.shape[0] - 1
    row, col = expand_pairs(
        a_indptr, a_indices, a_nnz, b_indptr, b_indices,
        n_cols=n_cols, flops_pad=flops_pad,
    )
    return masked_counts_compress(
        row, col, f_indptr, f_indices, f_nnz, n_rows, n_cols
    )


def masked_counts_compress(
    row, col, f_indptr, f_indices, f_nnz, n_rows: int, n_cols: int
):
    """Masked counts over an expanded candidate stream (engine-agnostic: the
    ESC and sliced-ELL engines both feed their streams here).

    Two-stage: the counts compression (one sort + payload compaction sort,
    :func:`sort_compress_counts`), then a tagged join of the compacted
    entries against F's pairs (mask sorts first within an equal (row, col)
    run, ≡ ``sort_compress_masked``) with the counts riding as payload.
    Returns ``(c_indptr, c_indices, c_counts, nnz_c)`` with
    ``len(row) + len(f_indices)`` padded slots; valid entries never exceed
    the mask's nnz.
    """
    pf = f_indices.shape[0]
    f_row = _row_ids(f_indptr, pf)
    f_valid = jnp.arange(pf, dtype=INT) < f_nnz
    f_row = jnp.where(f_valid, f_row, n_rows)
    f_col = jnp.where(f_valid, f_indices, n_cols)

    if packable(n_rows, 2 * n_cols + 1):
        bl = int(n_cols).bit_length()
        # stage 1: counts compression on plain pair keys
        key = (row << bl) | col
        key_s = jax.lax.sort((key,), is_stable=False)[0]
        valid = key_s < (n_rows << bl)
        q = jnp.cumsum(valid.astype(INT)) - valid.astype(INT)
        total = jnp.sum(valid, dtype=INT)
        prev = jnp.concatenate([jnp.full((1,), -1, INT), key_s[:-1]])
        keep = (key_s != prev) & valid
        n_uniq = jnp.sum(keep, dtype=INT)
        demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max >> 1)
        u_keys, qc = jax.lax.sort((demoted, q), num_keys=1, is_stable=False)
        mark = jnp.arange(key_s.shape[0], dtype=INT)
        nxt = jnp.where(mark + 1 < n_uniq, jnp.roll(qc, -1), total)
        u_counts = jnp.where(mark < n_uniq, nxt - qc, 0)
        # stage 2: tagged join against the mask, counts as payload
        jk = jnp.concatenate(
            [(u_keys << 1) | 1, (((f_row << bl) | f_col) << 1)]
        )
        jc = jnp.concatenate([u_counts, jnp.zeros(pf, INT)])
        jk_s, jc_s = jax.lax.sort((jk, jc), num_keys=1, is_stable=False)
        jprev = jnp.concatenate([jnp.full((1,), -2, INT), jk_s[:-1]])
        keep2 = (
            ((jk_s & 1) == 1)
            & (jprev == (jk_s & ~1))
            & (jk_s < ((n_rows << (bl + 1)) | 1))
        )
        nnz_c = jnp.sum(keep2, dtype=INT)
        dem2 = jnp.where(keep2, jk_s, jnp.iinfo(jnp.int32).max)
        c_keys, c_counts = jax.lax.sort(
            (dem2, jnp.where(keep2, jc_s, 0)), num_keys=1, is_stable=False
        )
        c_indices = (c_keys >> 1) & ((1 << bl) - 1)
        if _histogram_indptr_wins(n_rows, jk.shape[0]):
            c_indptr = _indptr_from_sorted_rows(
                jax.lax.shift_right_logical(c_keys, bl + 1), n_rows
            )
        else:
            c_indptr = jnp.searchsorted(
                c_keys, jnp.arange(n_rows + 1, dtype=INT) << (bl + 1),
                side="left",
            ).astype(INT)
        return c_indptr, c_indices, c_counts, nnz_c

    # general path: 2-key counts compression, then a 3-key tagged join
    u_ptr, u_idx, u_cnt, n_uniq = sort_compress_counts(
        row, col, n_rows, n_cols
    )
    u_rows = _row_ids(u_ptr, u_idx.shape[0])
    uvalid = jnp.arange(u_idx.shape[0], dtype=INT) < n_uniq
    u_rows = jnp.where(uvalid, u_rows, n_rows)
    u_cols = jnp.where(uvalid, u_idx, n_cols)
    rows = jnp.concatenate([u_rows, f_row])
    cols = jnp.concatenate([u_cols, f_col])
    tags = jnp.concatenate(
        [jnp.ones(u_rows.shape[0], INT), jnp.zeros(pf, INT)]
    )
    cnts = jnp.concatenate([u_cnt, jnp.zeros(pf, INT)])
    rs, cs, ts, ks = jax.lax.sort(
        (rows, cols, tags, cnts), num_keys=3, is_stable=False
    )
    pr = jnp.concatenate([jnp.full((1,), -1, INT), rs[:-1]])
    pc = jnp.concatenate([jnp.full((1,), -1, INT), cs[:-1]])
    pt = jnp.concatenate([jnp.full((1,), -1, INT), ts[:-1]])
    keep2 = (
        (ts == 1) & (pr == rs) & (pc == cs) & (pt == 0) & (rs < n_rows)
    )
    nnz_c = jnp.sum(keep2, dtype=INT)
    dr = jnp.where(keep2, rs, n_rows)
    dc = jnp.where(keep2, cs, n_cols)
    c_rows, c_indices, c_counts = jax.lax.sort(
        (dr, dc, jnp.where(keep2, ks, 0)), num_keys=2, is_stable=False
    )
    if _histogram_indptr_wins(n_rows, rows.shape[0]):
        c_indptr = _indptr_from_sorted_rows(c_rows, n_rows)
    else:
        c_indptr = jnp.searchsorted(
            c_rows, jnp.arange(n_rows + 1, dtype=INT), side="left"
        ).astype(INT)
    return c_indptr, c_indices, c_counts, nnz_c


def _check_counts_engine(engine: str, chunk_flops: int | None) -> None:
    if engine not in ("auto", "esc", "ell"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine == "ell" and chunk_flops is not None:
        raise ValueError(
            "engine='ell' is mutually exclusive with chunk_flops "
            "(explicit chunk_flops forces the ESC engine)"
        )


def masked_spgemm_counts(
    f: BCSR, a: BCSR, b: BCSR, *, chunk_flops: int | None = None,
    engine: str = "auto",
) -> tuple[BCSR, np.ndarray]:
    """C = F .* (A·B) structure plus per-entry multiplicities.

    With ``f = a = b`` = an undirected adjacency this is the per-edge
    **common-neighbor count** (the triangle support with multiplicities —
    the standard link-prediction primitive; Jaccard/Adamic-Adar follow from
    these counts plus row degrees on the host).  MASK FIRST, like
    :func:`..masked.masked_spgemm`.
    """
    _check_counts_engine(engine, chunk_flops)
    if a.n_cols != b.n_rows or tuple(f.shape) != (a.n_rows, b.n_cols):
        raise ValueError(f"shape mismatch: F{f.shape} vs {a.shape} @ {b.shape}")
    from .spgemm import require_int32_operands

    require_int32_operands(f, a, b)
    n, m = a.n_rows, b.n_cols
    if a.nnz == 0 or b.nnz == 0 or f.nnz == 0:
        empty = BCSR(np.zeros(n + 1, np.int32), np.zeros(0, np.int32), (n, m))
        return empty, np.zeros(0, np.int64)
    # F canonical for the join; A/B canonical so multiplicities aren't
    # inflated by duplicate operand entries (no-op when already canonical)
    f = f.sum_duplicates()
    a, b = a.sum_duplicates(), b.sum_duplicates()

    # sliced-ELL route (≡ masked_spgemm's): masked=True keeps the stage-2
    # join key single-int32 packed; explicit ``chunk_flops`` forces ESC
    if chunk_flops is None and engine in ("auto", "ell"):
        from .ell import AUTO_ELL_MAX_SLOTS, cached_executor

        try:
            ex = cached_executor(a, b, masked=True)
            fits = ex.total_slots <= AUTO_ELL_MAX_SLOTS
        except OverflowError:
            if engine == "ell":
                raise
            fits = False
            ex = None
        if fits or engine == "ell":
            return ex.assemble_counts(ex.run_masked_counts(f))

    chunk_flops = chunk_flops or DEFAULT_CHUNK_FLOPS
    rf = row_flops(a, b)
    chunks, rows_pad, nnz_pad, flops_pad = uniform_chunk_plan(
        a, rf, chunk_flops, 2 * m + 1
    )
    f_nnz_pad = pad_bucket(
        max(int(f.indptr[r1] - f.indptr[r0]) for r0, r1 in chunks)
    )
    b_indptr = jnp.asarray(b.indptr)
    b_indices = jnp.asarray(b.indices)

    indptr_parts = [np.zeros(1, np.int64)]
    index_parts, count_parts = [], []
    base = 0
    for r0, r1 in chunks:
        ptr, idx, nnz_local = pad_chunk_csr(a, r0, r1, rows_pad, nnz_pad)
        f_ptr, f_idx, f_local = pad_chunk_csr(
            f, r0, r1, rows_pad, f_nnz_pad, fill=m
        )
        c_ptr, c_idx, c_cnt, nnz_c = _masked_counts_padded(
            jnp.asarray(f_ptr),
            jnp.asarray(f_idx),
            jnp.asarray(f_local, INT),
            jnp.asarray(ptr),
            jnp.asarray(idx),
            jnp.asarray(nnz_local, INT),
            b_indptr,
            b_indices,
            n_cols=m,
            flops_pad=flops_pad,
        )
        k = int(nnz_c)
        index_parts.append(np.asarray(c_idx)[:k])
        count_parts.append(np.asarray(c_cnt)[:k])
        indptr_parts.append(
            np.asarray(c_ptr[1 : r1 - r0 + 1], dtype=np.int64) + base
        )
        base += k
    indptr = np.concatenate(indptr_parts)
    indices = (
        np.concatenate(index_parts) if index_parts else np.zeros(0, np.int32)
    )
    counts = (
        np.concatenate(count_parts).astype(np.int64)
        if count_parts
        else np.zeros(0, np.int64)
    )
    return BCSR(indptr, indices, (n, m)), counts


def spgemm_counts(
    a: BCSR, b: BCSR, *, chunk_flops: int | None = None, engine: str = "auto"
) -> tuple[BCSR, np.ndarray]:
    """C = A·B structure plus per-entry multiplicities (the numeric values of
    the integer product of 0/1 matrices).

    Returns ``(c, counts)`` with ``counts[k]`` = multiplicity of
    ``c.indices[k]`` (int64 on host).

    ``engine``: ``"auto"`` takes sliced-ELL when the padded expansion fits
    the resident budget, else chunked ESC; ``"ell"`` forces ELL (raises
    OverflowError when it cannot fit); ``"esc"`` forces the chunked ESC
    path.  Explicit ``chunk_flops`` also forces ESC (mutually exclusive
    with ``engine="ell"``).
    """
    _check_counts_engine(engine, chunk_flops)
    if a.n_cols != b.n_rows:
        raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
    from .spgemm import require_int32_operands

    require_int32_operands(a, b)
    n, m = a.n_rows, b.n_cols
    if a.nnz == 0 or b.nnz == 0:
        empty = BCSR(np.zeros(n + 1, np.int32), np.zeros(0, np.int32), (n, m))
        return empty, np.zeros(0, np.int64)
    # duplicate operand entries would inflate multiplicities (boolean ops
    # dedup for free in the sort; counts cannot) — canonicalise (no-op copy
    # when already canonical)
    a, b = a.sum_duplicates(), b.sum_duplicates()

    # Engine choice mirrors spgemm(): the sliced-ELL expansion (row-gather,
    # packed-key chunk sorts) beats ESC whenever its padded expansion fits
    # one program; sort_compress_counts is shared so results are bit-exact
    # either way.  Explicit ``chunk_flops`` forces the chunked ESC path.
    if chunk_flops is None and engine == "auto":
        # small-flop inputs beat the device dispatch floor on the host
        from .host import HOST_MAX_FLOPS, host_spgemm_counts
        from .spgemm import spgemm_flops

        if spgemm_flops(a, b) <= HOST_MAX_FLOPS:
            return host_spgemm_counts(a, b)

    if chunk_flops is None and engine in ("auto", "ell"):
        from .ell import AUTO_ELL_MAX_SLOTS, cached_executor

        try:
            ex = cached_executor(a, b)
            # two resident output arrays (indices + counts): halve the budget
            fits = ex.resident_slots <= AUTO_ELL_MAX_SLOTS // 2
        except OverflowError:
            if engine == "ell":
                raise
            fits = False
            ex = None
        if fits or engine == "ell":
            return ex.assemble_counts(ex.run_counts())

    chunk_flops = chunk_flops or DEFAULT_CHUNK_FLOPS
    rf = row_flops(a, b)
    chunks, rows_pad, nnz_pad, flops_pad = uniform_chunk_plan(
        a, rf, chunk_flops, m
    )
    b_indptr = jnp.asarray(b.indptr)
    b_indices = jnp.asarray(b.indices)

    indptr_parts = [np.zeros(1, np.int64)]
    index_parts, count_parts = [], []
    base = 0
    for r0, r1 in chunks:
        ptr, idx, nnz_local = pad_chunk_csr(a, r0, r1, rows_pad, nnz_pad)
        c_ptr, c_idx, c_cnt, nnz_c = _counts_padded(
            jnp.asarray(ptr),
            jnp.asarray(idx),
            jnp.asarray(nnz_local, INT),
            b_indptr,
            b_indices,
            n_cols=m,
            flops_pad=flops_pad,
        )
        k = int(nnz_c)
        index_parts.append(np.asarray(c_idx)[:k])
        count_parts.append(np.asarray(c_cnt)[:k])
        indptr_parts.append(
            np.asarray(c_ptr[1 : r1 - r0 + 1], dtype=np.int64) + base
        )
        base += k
    indptr = np.concatenate(indptr_parts)
    indices = (
        np.concatenate(index_parts) if index_parts else np.zeros(0, np.int32)
    )
    counts = (
        np.concatenate(count_parts).astype(np.int64)
        if count_parts
        else np.zeros(0, np.int64)
    )
    return BCSR(indptr, indices, (n, m)), counts


def triangle_count_device(a: BCSR, *, chunk_flops: int | None = None) -> int:
    """Triangles of the undirected simple graph with (symmetric, hollow)
    adjacency A, computed on device: Σ_{(i,j)∈A} mult((A·A)[i,j]) / 6.

    Each chunk returns ONE scalar — no index arrays ever leave the device
    (the win over pulling ``triangle_structure`` + recounting on host).
    """
    if a.n_rows != a.n_cols:
        raise ValueError("triangles need a square matrix")
    from .spgemm import require_int32_operands

    require_int32_operands(a)
    if a.nnz == 0:
        return 0
    a = a.sum_duplicates()
    n = a.n_rows

    # sliced-ELL route: per-chunk scalar wedge sums over the row-gather
    # expansion (run_counts_sum); explicit ``chunk_flops`` forces ESC
    if chunk_flops is None:
        from .ell import AUTO_ELL_MAX_SLOTS, cached_executor

        try:
            ex = cached_executor(a, a, masked=True)
            if ex.total_slots <= AUTO_ELL_MAX_SLOTS:
                sums = np.asarray(ex.run_counts_sum(a))
                total = int(sums[: ex.n_chunks].astype(np.int64).sum())
                if total % 6:
                    raise ValueError(
                        "edge-incident wedge sum not divisible by 6 — "
                        "adjacency must be symmetric with an empty diagonal"
                    )
                return total // 6
        except OverflowError:
            pass

    chunk_flops = chunk_flops or DEFAULT_CHUNK_FLOPS
    rf = row_flops(a, a)
    # (row, col, tag) packs into one key only under the wider masked bound
    chunks, rows_pad, nnz_pad, flops_pad = uniform_chunk_plan(
        a, rf, chunk_flops, 2 * n + 1
    )
    f_nnz_pad = pad_bucket(
        max(int(a.indptr[r1] - a.indptr[r0]) for r0, r1 in chunks)
    )
    b_indptr = jnp.asarray(a.indptr)
    b_indices = jnp.asarray(a.indices)

    total = 0
    for r0, r1 in chunks:
        ptr, idx, nnz_local = pad_chunk_csr(a, r0, r1, rows_pad, nnz_pad)
        f_ptr, f_idx, f_local = pad_chunk_csr(
            a, r0, r1, rows_pad, f_nnz_pad, fill=n
        )
        s = _masked_counts_sum_padded(
            jnp.asarray(f_ptr),
            jnp.asarray(f_idx),
            jnp.asarray(f_local, INT),
            jnp.asarray(ptr),
            jnp.asarray(idx),
            jnp.asarray(nnz_local, INT),
            b_indptr,
            b_indices,
            n_cols=n,
            flops_pad=flops_pad,
        )
        total += int(s)
    if total % 6:
        raise ValueError(
            "edge-incident wedge sum not divisible by 6 — adjacency must be "
            "symmetric with an empty diagonal"
        )
    return total // 6
