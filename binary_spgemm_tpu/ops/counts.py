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
import numpy as np

from ..formats.bcsr import BCSR
from .spgemm import (
    INT,
    DEFAULT_CHUNK_FLOPS,
    _forward_fill_last,
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
    "masked_counts_compress",
    "masked_counts_sum",
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


def masked_counts_sum(
    row, col, f_indptr, f_indices, f_nnz, n_rows: int, n_cols: int
):
    """Σ over mask entries (i, j) of multiplicity of candidate pair (i, j) —
    one traced int32 scalar (composable: also the per-shard kernel of
    :func:`..parallel.dist_spgemm.dist_triangle_count`).

    One tagged sort (mask pairs sort before candidates within an equal
    (row, col) run, ≡ ``sort_compress_masked``); a forward-fill of the most
    recent mask key marks every candidate belonging to a masked run, and the
    answer is the count of marked candidates.  Bounded by the candidate
    stream's padded length, so int32 cannot overflow per call.
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
        # last mask key (+1) at or before each position; for a candidate,
        # (key & ~1) + 1 == key, so "my run is masked" is filled == key —
        # and the +1 bias keeps position-0 (fill value 0) from matching a
        # (0, 0) candidate with no mask entry
        filled = _forward_fill_last(key_s + 1, is_mask)
        counted = (
            (~is_mask) & (filled == key_s) & (key_s < (n_rows << shift))
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
    # the two fills pick the same (most recent) mask entry, so together they
    # identify its (row, col); +1 bias as above
    fr = _forward_fill_last(rows_s + 1, is_mask)
    fc = _forward_fill_last(cols_s + 1, is_mask)
    counted = (
        (~is_mask)
        & (fr == rows_s + 1)
        & (fc == cols_s + 1)
        & (rows_s < n_rows)
    )
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
