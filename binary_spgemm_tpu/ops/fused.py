"""Fused boolean kernels: C = D OR (A·B), optionally masked.

The reference's ``SpGEMM_dor`` family (old/BSpGEMM.c:75-367) fuses a previous
matrix D into the Gustavson accumulation by pre-seeding the SPA with D's row —
the accumulate primitive of its blocked designs.  In the ESC engine the fusion
is structural: D's (row, col) pairs are **concatenated with the expansion
candidates before the sort**, so the union costs one slightly longer sort
instead of a separate pass — the TPU analogue of SPA pre-seeding.

Masked-semantics note — a DELIBERATE divergence from the reference:
``SpGEMM_dor_masked`` (old/BSpGEMM.c:205-216) masks the D seed as well — it
computes ``F ∩ (D ∪ A·B)`` (D entries outside F are dropped).  This framework
keeps D unconditional: ``C = D ∪ (F ∩ A·B)``.  Fused accumulation here must
never drop previously-accumulated entries — ``transitive_closure`` and the
SPMD accumulators rely on monotone growth of D — so the mask applies only to
the new product term.  To reproduce the reference's contract, pre-intersect
D with F before the call (e.g. ``masked_spgemm``-style join of D against F).
See PARITY.md O6.
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
    _stitch_pipelined,
    expand_pairs,
    pad_bucket,
    pad_chunk_csr,
    packable,
    pull_padded_tuple,
    row_flops,
    sort_compress,
    uniform_chunk_plan,
)

__all__ = ["spgemm_or", "spgemm_or_padded"]


@functools.partial(jax.jit, static_argnames=("n_cols", "flops_pad"))
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
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Jitted C = D OR (F.*?(A·B)) over padded CSR arrays.

    Unmasked: D's pairs simply join the candidate stream before the sort
    (the SPA pre-seed analogue).  Masked: one **three-way sort-join** — mask,
    D, and candidate entries share the stream with a 2-bit tag ordering them
    mask < D < candidate within an equal (row, col) run, so a D entry
    survives as its run's first D, and a candidate survives only when its
    immediate predecessor is its pair's mask entry (a D predecessor means the
    pair is already in the output; a candidate predecessor is a duplicate).
    No per-candidate probing — same design as ``sort_compress_masked``.
    """
    n_rows = a_indptr.shape[0] - 1
    row, col = expand_pairs(
        a_indptr, a_indices, a_nnz, b_indptr, b_indices,
        n_cols=n_cols, flops_pad=flops_pad,
    )
    pd = d_indices.shape[0]
    d_rows = _row_ids(d_indptr, pd)
    d_valid = jnp.arange(pd, dtype=INT) < d_nnz
    d_rows = jnp.where(d_valid, d_rows, n_rows)
    d_cols = jnp.where(d_valid, d_indices, n_cols)
    if f_indptr is None:
        # D's pairs join the candidate stream (SPA pre-seed analogue)
        row = jnp.concatenate([row, d_rows])
        col = jnp.concatenate([col, d_cols])
        return sort_compress(row, col, n_rows, n_cols)
    pf = f_indices.shape[0]
    f_rows = _row_ids(f_indptr, pf)
    f_valid = jnp.arange(pf, dtype=INT) < f_indptr[-1]
    f_rows = jnp.where(f_valid, f_rows, n_rows)
    f_cols = jnp.where(f_valid, f_indices, n_cols)
    return _sort_compress_or_masked(
        row, col, d_rows, d_cols, f_rows, f_cols, n_rows, n_cols
    )


def _sort_compress_or_masked(
    row, col, d_row, d_col, f_row, f_col, n_rows: int, n_cols: int
):
    """Three-way tagged sort-join for C = D OR (F .* candidates)."""
    if packable(n_rows, 4 * n_cols + 3):
        shift = int(n_cols).bit_length() + 2
        keys = jnp.concatenate(
            [
                ((row << shift) | (col << 2)) | 2,  # candidates last in run
                ((d_row << shift) | (d_col << 2)) | 1,
                (f_row << shift) | (f_col << 2),  # mask first in run
            ]
        )
        key_s = jax.lax.sort((keys,), is_stable=False)[0]
        prev = jnp.concatenate([jnp.full((1,), -1, INT), key_s[:-1]])
        pair = jax.lax.shift_right_logical(key_s, 2)
        prev_pair = jax.lax.shift_right_logical(prev, 2)
        tag = key_s & 3
        prev_tag = prev & 3
        same = pair == prev_pair
        keep_d = (tag == 1) & (~same | (prev_tag == 0))
        keep_c = (tag == 2) & same & (prev_tag == 0)
        bound = key_s < ((n_rows << shift) | 2)
        keep = (keep_d | keep_c) & bound
        nnz_c = jnp.sum(keep, dtype=INT)
        demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max)
        c_keys = jax.lax.sort((demoted,), is_stable=False)[0]
        c_indices = (c_keys >> 2) & ((1 << (shift - 2)) - 1)
        if _histogram_indptr_wins(n_rows, keys.shape[0]):
            c_indptr = _indptr_from_sorted_rows(
                jax.lax.shift_right_logical(c_keys, shift), n_rows
            )
        else:
            c_indptr = jnp.searchsorted(
                c_keys, jnp.arange(n_rows + 1, dtype=INT) << shift,
                side="left",
            ).astype(INT)
        return c_indptr, c_indices, nnz_c

    rows = jnp.concatenate([row, d_row, f_row])
    cols = jnp.concatenate([col, d_col, f_col])
    tags = jnp.concatenate(
        [
            jnp.full(row.shape[0], 2, INT),
            jnp.ones(d_row.shape[0], INT),
            jnp.zeros(f_row.shape[0], INT),
        ]
    )
    row_s, col_s, tag_s = jax.lax.sort(
        (rows, cols, tags), num_keys=3, is_stable=False
    )
    prev_row = jnp.concatenate([jnp.full((1,), -1, INT), row_s[:-1]])
    prev_col = jnp.concatenate([jnp.full((1,), -1, INT), col_s[:-1]])
    prev_tag = jnp.concatenate([jnp.full((1,), 2, INT), tag_s[:-1]])
    same = (row_s == prev_row) & (col_s == prev_col)
    keep_d = (tag_s == 1) & (~same | (prev_tag == 0))
    keep_c = (tag_s == 2) & same & (prev_tag == 0)
    keep = (keep_d | keep_c) & (row_s < n_rows)
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


def _sort_compress_or_masked_seps_2d_keys(
    key, d_row, d_col, f_row, f_col, n_rows: int, n_cols: int
):
    """Packed branch of :func:`_sort_compress_or_masked_seps_2d` taking the
    candidate stream as PRE-PACKED plain keys; the 2-bit-tagged join key
    derives as ``(key << 2) | 2``.  Bit-identical to the pair form (caller
    checks ``packable(n_rows, 4 * n_cols + 3)``)."""
    k = key.shape[0]
    shift = int(n_cols).bit_length() + 2
    col_mask = (1 << (shift - 2)) - 1
    keys = jnp.concatenate(
        [
            (key << 2) | 2,  # candidates last in run
            ((d_row << shift) | (d_col << 2)) | 1,
            (f_row << shift) | (f_col << 2),  # mask first in run
        ],
        axis=1,
    )
    key_s = sort_rows_1key(keys)
    prev = jnp.concatenate(
        [jnp.full((k, 1), -1, INT), key_s[:, :-1]], axis=1
    )
    pair = jax.lax.shift_right_logical(key_s, 2)
    prev_pair = jax.lax.shift_right_logical(prev, 2)
    tag = key_s & 3
    prev_tag = prev & 3
    same = pair == prev_pair
    bound = key_s < ((n_rows << shift) | 2)
    is_sep = (tag == 2) & bound & (((key_s >> 2) & col_mask) == n_cols)
    keep_d = (tag == 1) & (~same | (prev_tag == 0))
    keep_c = (tag == 2) & same & (prev_tag == 0)
    keep = ((keep_d | keep_c) & bound) | is_sep
    nnz_c = jnp.sum(keep, axis=1, dtype=INT)
    demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max)
    c_keys = sort_rows_1key(demoted)
    return (c_keys >> 2) & col_mask, nnz_c


def _sort_compress_or_masked_seps_2d(
    row, col, d_row, d_col, f_row, f_col, n_rows: int, n_cols: int
):
    """Batched :func:`_sort_compress_or_masked` with embedded row separators:
    all streams are ``[k, ·]`` (candidates include one ``(r, n_cols)``
    separator per chunk row; D/mask pairs pre-sentineled to
    ``(n_rows, n_cols)``); the three-way tagged join sorts along axis -1.

    Separators ride the 2-bit tag unambiguously here because they are
    candidate-tagged with ``col == n_cols`` — real candidates/D/mask columns
    are all ``< n_cols`` and padding rows are ``≥ n_rows``, so
    ``tag==cand ∧ col==n_cols ∧ row<n_rows`` identifies exactly the
    separators, which survive unconditionally.  Returns sep-embedded
    ``(indices, nnz)`` stacked over chunks."""
    if packable(n_rows, 4 * n_cols + 3):
        bl = int(n_cols).bit_length()
        return _sort_compress_or_masked_seps_2d_keys(
            (row << bl) | col, d_row, d_col, f_row, f_col, n_rows, n_cols
        )

    k = row.shape[0]
    rows = jnp.concatenate([row, d_row, f_row], axis=1)
    cols = jnp.concatenate([col, d_col, f_col], axis=1)
    tags = jnp.concatenate(
        [
            jnp.full(row.shape, 2, INT),
            jnp.ones(d_row.shape, INT),
            jnp.zeros(f_row.shape, INT),
        ],
        axis=1,
    )
    row_s, col_s, tag_s = jax.lax.sort(
        (rows, cols, tags), dimension=1, num_keys=3, is_stable=False
    )
    pad1 = jnp.full((k, 1), -1, INT)
    prev_row = jnp.concatenate([pad1, row_s[:, :-1]], axis=1)
    prev_col = jnp.concatenate([pad1, col_s[:, :-1]], axis=1)
    prev_tag = jnp.concatenate(
        [jnp.full((k, 1), 2, INT), tag_s[:, :-1]], axis=1
    )
    same = (row_s == prev_row) & (col_s == prev_col)
    in_range = row_s < n_rows
    is_sep = (tag_s == 2) & (col_s == n_cols) & in_range
    keep_d = (tag_s == 1) & (~same | (prev_tag == 0))
    keep_c = (tag_s == 2) & same & (prev_tag == 0)
    keep = ((keep_d | keep_c) & in_range) | is_sep
    nnz_c = jnp.sum(keep, axis=1, dtype=INT)
    demoted_r = jnp.where(keep, row_s, n_rows)
    demoted_c = jnp.where(keep, col_s, n_cols)
    _, c_indices = jax.lax.sort(
        (demoted_r, demoted_c), dimension=1, num_keys=2, is_stable=False
    )
    return c_indices, nnz_c


def spgemm_or(
    d: BCSR,
    a: BCSR,
    b: BCSR,
    *,
    mask: BCSR | None = None,
    chunk_flops: int | None = None,
) -> BCSR:
    """C = D OR (A·B), optionally D OR (mask .* (A·B)).

    ≡ ``SpGEMM_dor`` (old/BSpGEMM.c:75-182).  With ``mask`` the semantics
    deliberately diverge from ``SpGEMM_dor_masked`` (old/BSpGEMM.c:205-216):
    the reference masks the D seed too (``F ∩ (D ∪ A·B)``); here D is
    unconditional (``D ∪ (F ∩ A·B)``) so accumulation is monotone — see the
    module docstring and PARITY.md O6.
    """
    if a.n_cols != b.n_rows or tuple(d.shape) != (a.n_rows, b.n_cols):
        raise ValueError(f"shape mismatch: D{d.shape} vs {a.shape} @ {b.shape}")
    from .spgemm import require_int32_operands

    require_int32_operands(d, a, b)
    n, m = a.n_rows, b.n_cols
    if a.nnz == 0 or b.nnz == 0:
        from .union import spm_or

        empty = BCSR(np.zeros(n + 1, np.int32), np.zeros(0, np.int32), (n, m))
        return spm_or(d, empty)

    if mask is not None:
        if tuple(mask.shape) != (n, m):
            raise ValueError(f"mask shape {mask.shape} != {(n, m)}")
        mask = mask.sum_duplicates()

    # Small fused products beat the ~27 ms device dispatch floor on the
    # host (same auto-route as spgemm()/spm_or(); see ops/host.py)
    from .host import HOST_OR_MAX_NNZ, host_spgemm_or
    from .spgemm import spgemm_flops

    mask_nnz = mask.nnz if mask is not None else 0
    if (
        chunk_flops is None
        and d.nnz + mask_nnz <= HOST_OR_MAX_NNZ  # O(1) screen before the
        and spgemm_flops(a, b) + d.nnz + mask_nnz <= HOST_OR_MAX_NNZ
        # O(nnz(a)) flop count — large calls skip the host pass entirely
    ):
        return host_spgemm_or(d, a, b, mask=mask)

    # Engine choice mirrors spgemm(): the sliced-ELL fused kernels (D joins
    # the chunk sort / three-way tagged join) whenever the expansion fits;
    # explicit ``chunk_flops`` forces the chunked ESC path below.
    if chunk_flops is None:
        from .ell import AUTO_ELL_MAX_SLOTS, cached_executor

        try:
            ex = cached_executor(a, b, masked=mask is not None)
            # budget what run_or actually allocates: every chunk's sort and
            # output widen by the staged D (and mask) pads
            d_pad = ex.staged_nnz_pad(d)
            if mask is None:
                budget = (
                    min(
                        pad_bucket(ex.out_pad + d_pad),
                        pad_bucket(ex.sort_pad + d_pad, div=32),
                    )
                    * ex.n_chunks
                )
            else:
                f_pad = ex.staged_nnz_pad(mask)
                # the batched masked join keeps the separator-embedded
                # stream (full sort_pad per chunk); only the unrolled
                # kernel re-sorts without the separators (sort_pad -
                # rows_pad) — budget the form that will actually run
                base = (
                    ex.sort_pad if ex.batched else ex.sort_pad - ex.rows_pad
                )
                budget = (base + d_pad + f_pad) * ex.n_chunks
            if budget <= AUTO_ELL_MAX_SLOTS:
                return ex.assemble(ex.run_or(d, mask=mask))
        except OverflowError:
            pass

    chunk_flops = chunk_flops or DEFAULT_CHUNK_FLOPS
    rf = row_flops(a, b)
    # the masked kernel packs (row, col, 2-bit tag), so the row cap must be
    # computed against the wider key (see _sort_compress_or_masked)
    key_cols = (4 * m + 3) if mask is not None else m
    chunks, rows_pad, nnz_pad, flops_pad = uniform_chunk_plan(
        a, rf, chunk_flops, key_cols
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

    def dispatch(r0, r1):
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
        return spgemm_or_padded(*args, n_cols=m, flops_pad=flops_pad)

    def finish(out):
        return pull_padded_tuple(*out)

    return _stitch_pipelined(chunks, n, (n, m), dispatch, finish)
