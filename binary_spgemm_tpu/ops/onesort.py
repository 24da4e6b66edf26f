"""ONE-SORT device-resident SpGEMM: padded sentinel-holed streams.

Every sort-engine multiply here ends with a *compaction sort* whose only job
is to squeeze demoted duplicates out of the already-sorted candidate stream
(``sort_compress``: sort → dedup-demote → sort again).  The round-4 A/B
measured that dropping it halves device time at mid-64k (34.9 → 17.3 ms,
ab="one-sort") — but the win was stranded in an opt-in host-pull path
(``EllSpGEMMExecutor.run_padded``).  This module lands the contract in the
device-resident pipelines (VERDICT r04 ask #1): iterated products
(reachability closure, k-hop) consume each other's **uncompacted** streams
directly, so every accumulation round pays ONE sort instead of two and no
compaction ever runs between rounds.

Representation (:class:`PaddedDeviceBCSR`): the post-dedup stream *without*
the compaction sort — per-row column runs sorted ascending with demoted
duplicates left in place as ``n_cols`` holes, plus a **positional** row
pointer (spans include the holes, computed by one searchsorted/histogram on
the sorted stream).  Expansion against such an operand works verbatim: row
``j``'s span is gathered wholesale and hole slots simply expand to sort-tail
sentinels (the fused-OR D-seed join already tolerates sentinels and
duplicates by construction — the stream dedups them like any other
candidate).  The price is stream inflation: holes ride along as dead slots
in the next round's gather and seed.  :meth:`PaddedDeviceBCSR.compact`
(one sort) bounds that when the hole fraction compounds.

The reference has no analogue — its per-row SPA+quicksort recomputes from
scratch every call (final/SpGEMM_mpi_omp.c:36-50); the closest design is its
``SpGEMM_dor`` SPA pre-seed (old/BSpGEMM.c:75-126), which this generalises to
an uncompacted seed.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.bcsr import BCSR
from .spgemm import (
    INT,
    DeviceBCSR,
    _forward_fill_last,
    _histogram_indptr_wins,
    _indptr_from_sorted_rows,
    _row_ids,
    packable,
    pad_bucket,
)

__all__ = [
    "PaddedDeviceBCSR",
    "spgemm_onesort_device",
    "spgemm_or_onesort_device",
    "flops_bound_onesort",
]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PaddedDeviceBCSR:
    """Device-resident one-sort CSR: a sorted column stream with holes.

    ``cols[indptr_pos[j] : indptr_pos[j+1]]`` holds row ``j``'s columns in
    ascending order, interleaved with ``n_cols`` sentinel holes (demoted
    duplicates); positions past ``indptr_pos[n_rows]`` are all-sentinel
    tail.  ``nnz`` is the traced count of valid (``< n_cols``) entries.
    Everything a consumer needs — validity is ``cols < n_cols``, no
    separate mask array.
    """

    cols: jax.Array  # int32 [E], holes/tail = n_cols
    indptr_pos: jax.Array  # int32 [n_rows + 1], POSITIONAL (spans incl. holes)
    nnz: jax.Array  # int32 scalar, valid entries
    shape: tuple[int, int]

    def tree_flatten(self):
        return (self.cols, self.indptr_pos, self.nnz), self.shape

    @classmethod
    def tree_unflatten(cls, shape, children):
        return cls(*children, shape=tuple(shape))

    @property
    def stream_len(self) -> int:
        return self.cols.shape[0]

    @classmethod
    def from_device(cls, mat: DeviceBCSR) -> "PaddedDeviceBCSR":
        """Wrap a compact :class:`DeviceBCSR` (no holes) — free, no sort.

        A compact CSR *is* a padded stream whose positional pointers equal
        its rank pointers; the undefined padded tail is demoted to
        sentinels so validity stays ``cols < n_cols``.
        """
        n_cols = mat.shape[1]
        e = mat.indices.shape[0]
        valid = jnp.arange(e, dtype=INT) < mat.nnz
        cols = jnp.where(valid, mat.indices, n_cols)
        return cls(cols, mat.indptr.astype(INT), mat.nnz, tuple(mat.shape))

    @classmethod
    def from_host(cls, mat: BCSR) -> "PaddedDeviceBCSR":
        return cls.from_device(DeviceBCSR.from_host(mat))

    def compact(self, pad_to: int | None = None) -> DeviceBCSR:
        """Squeeze the holes out: ONE compaction sort → :class:`DeviceBCSR`.

        This is exactly the sort the one-sort rounds skip — call it once at
        pipeline exit, or between rounds when the hole fraction compounds
        past profit (see ``_closure_onesort``'s ratio gate).  Host-syncs
        ``nnz`` to bucket the output pad.
        """
        n_rows, n_cols = self.shape
        rows = _row_ids(self.indptr_pos, self.stream_len)
        valid = self.cols < n_cols
        rows = jnp.where(valid, rows, n_rows)
        r_s, c_s = jax.lax.sort(
            (rows, self.cols), num_keys=2, is_stable=False
        )
        indptr = (
            _indptr_from_sorted_rows(r_s, n_rows)
            if _histogram_indptr_wins(n_rows, self.stream_len)
            else jnp.searchsorted(
                r_s, jnp.arange(n_rows + 1, dtype=INT), side="left"
            ).astype(INT)
        )
        dev = DeviceBCSR(indptr, c_s, self.nnz, tuple(self.shape))
        nnz = int(self.nnz)
        pad = pad_to if pad_to is not None else pad_bucket(max(nnz, 1))
        return dev.compact(pad_to=max(pad, nnz))

    def to_host(self) -> BCSR:
        """Pull and compact host-side (no device sort): drop the holes,
        derive row pointers from the positional spans."""
        n_rows, n_cols = self.shape
        cols = np.asarray(self.cols)
        pos = np.asarray(self.indptr_pos).astype(np.int64)
        valid = np.flatnonzero(cols < n_cols)
        counts = np.diff(np.searchsorted(valid, pos))
        indptr = np.zeros(n_rows + 1, np.int32)
        np.cumsum(counts, out=indptr[1:])
        return BCSR(indptr, cols[valid].astype(np.int32), tuple(self.shape))


def _expand_from_padded(
    a_cols: jax.Array,
    a_indptr_pos: jax.Array,
    b_cols: jax.Array,
    b_indptr_pos: jax.Array,
    *,
    n_cols: int,
    flops_pad: int,
) -> tuple[jax.Array, jax.Array]:
    """ESC expansion where BOTH operands are padded hole-y streams.

    Same TPU formulation as :func:`..spgemm.expand_pairs` (cumsum B-index
    stream + cummax row ids — no per-slot ownership gathers); the only
    deltas are positional validity (``col < n_cols`` instead of a prefix
    count) and hole-slot demotion of gathered B columns.
    """
    e_a = a_cols.shape[0]
    n_rows = a_indptr_pos.shape[0] - 1
    E = flops_pad
    valid_a = a_cols < n_cols
    acol = jnp.where(valid_a, a_cols, 0)
    bstart = b_indptr_pos[acol]
    blen = jnp.where(valid_a, b_indptr_pos[acol + 1] - bstart, 0)
    cum = jnp.cumsum(blen, dtype=INT)
    total = cum[-1]
    offs = cum - blen
    rowid_a = _row_ids(a_indptr_pos, e_a)

    ne = blen > 0
    delta = bstart - offs
    ff = _forward_fill_last(delta, ne)
    prev_delta = jnp.concatenate([jnp.zeros(1, INT), ff[:-1]])
    jumps = delta - prev_delta
    starts = jnp.where(ne, offs, E)
    v = jnp.ones(E, INT).at[starts].add(jumps, mode="drop")
    bidx = jnp.cumsum(v, dtype=INT) - 1

    rid = jnp.zeros(E, INT).at[starts].max(rowid_a, mode="drop")
    row = jax.lax.cummax(rid)

    t = jnp.arange(E, dtype=INT)
    bidx = jnp.clip(bidx, 0, b_cols.shape[0] - 1)
    col = b_cols[bidx]
    # a hole slot inside B's span expands to a full sentinel (col would be
    # n_cols with a live row id — it must not survive the dedup bound)
    ok = (t < total) & (col < n_cols)
    row = jnp.where(ok, row, n_rows)
    col = jnp.where(ok, col, n_cols)
    return row, col


def _sort_dedup_padded(
    row: jax.Array, col: jax.Array, n_rows: int, n_cols: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """ONE sort + dedup-demote (NO compaction sort): the one-sort kernel tail.

    Returns ``(cols [len(row)], indptr_pos [n_rows+1], nnz)`` — the
    :class:`PaddedDeviceBCSR` fields.  Bit-equal valid set to
    :func:`..spgemm.sort_compress` by construction (same sort, same keep
    rule; only the compaction differs).
    """
    if packable(n_rows, n_cols):
        shift = int(n_cols).bit_length()
        key = (row << shift) | col
        key_s = jax.lax.sort((key,), is_stable=False)[0]
        prev = jnp.concatenate([jnp.full((1,), -1, INT), key_s[:-1]])
        keep = (key_s != prev) & (key_s < (n_rows << shift))
        nnz = jnp.sum(keep, dtype=INT)
        row_s = jax.lax.shift_right_logical(key_s, shift)
        cols = jnp.where(keep, key_s & ((1 << shift) - 1), n_cols)
    else:
        row_s, col_s = jax.lax.sort((row, col), num_keys=2, is_stable=False)
        prev_r = jnp.concatenate([jnp.full((1,), -1, INT), row_s[:-1]])
        prev_c = jnp.concatenate([jnp.full((1,), -1, INT), col_s[:-1]])
        keep = ((row_s != prev_r) | (col_s != prev_c)) & (row_s < n_rows)
        nnz = jnp.sum(keep, dtype=INT)
        cols = jnp.where(keep, col_s, n_cols)
    if _histogram_indptr_wins(n_rows, row.shape[0]):
        # positional spans: count EVERY position of the sorted stream
        # (duplicate positions become in-span holes)
        indptr_pos = _indptr_from_sorted_rows(row_s, n_rows)
    elif packable(n_rows, n_cols):
        shift = int(n_cols).bit_length()
        indptr_pos = jnp.searchsorted(
            key_s, jnp.arange(n_rows + 1, dtype=INT) << shift, side="left"
        ).astype(INT)
    else:
        indptr_pos = jnp.searchsorted(
            row_s, jnp.arange(n_rows + 1, dtype=INT), side="left"
        ).astype(INT)
    return cols, indptr_pos, nnz


def _sort_dedup_padded_masked(
    row, col, d_rows, d_cols, f_rows, f_cols, n_rows: int, n_cols: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """ONE-sort three-way tagged join: D OR (F .* candidates), uncompacted.

    Same join as :func:`..fused._sort_compress_or_masked` (mask < D <
    candidate within an equal (row, col) run; a D entry survives as its
    run's first D, a candidate survives only behind its pair's mask entry)
    minus the compaction sort — losers demote to in-span holes, and the
    mask's own entries ride along as holes too (they were never output).
    """
    if packable(n_rows, 4 * n_cols + 3):
        shift = int(n_cols).bit_length() + 2
        keys = jnp.concatenate(
            [
                ((row << shift) | (col << 2)) | 2,  # candidates last in run
                ((d_rows << shift) | (d_cols << 2)) | 1,
                (f_rows << shift) | (f_cols << 2),  # mask first in run
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
        keep = (keep_d | keep_c) & (key_s < ((n_rows << shift) | 2))
        nnz = jnp.sum(keep, dtype=INT)
        row_s = jax.lax.shift_right_logical(key_s, shift)
        cols = jnp.where(
            keep, (key_s >> 2) & ((1 << (shift - 2)) - 1), n_cols
        )
        if _histogram_indptr_wins(n_rows, keys.shape[0]):
            indptr_pos = _indptr_from_sorted_rows(row_s, n_rows)
        else:
            indptr_pos = jnp.searchsorted(
                key_s, jnp.arange(n_rows + 1, dtype=INT) << shift,
                side="left",
            ).astype(INT)
        return cols, indptr_pos, nnz

    rows = jnp.concatenate([row, d_rows, f_rows])
    cols = jnp.concatenate([col, d_cols, f_cols])
    tags = jnp.concatenate(
        [
            jnp.full(row.shape[0], 2, INT),
            jnp.ones(d_rows.shape[0], INT),
            jnp.zeros(f_rows.shape[0], INT),
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
    nnz = jnp.sum(keep, dtype=INT)
    out_cols = jnp.where(keep, col_s, n_cols)
    if _histogram_indptr_wins(n_rows, rows.shape[0]):
        indptr_pos = _indptr_from_sorted_rows(row_s, n_rows)
    else:
        indptr_pos = jnp.searchsorted(
            row_s, jnp.arange(n_rows + 1, dtype=INT), side="left"
        ).astype(INT)
    return out_cols, indptr_pos, nnz


def _as_padded(x) -> PaddedDeviceBCSR:
    if isinstance(x, PaddedDeviceBCSR):
        return x
    if isinstance(x, DeviceBCSR):
        return PaddedDeviceBCSR.from_device(x)
    raise TypeError(f"expected a device container, got {type(x).__name__}")


def _onesort_core(d_cols, d_pos, a_cols, a_pos, b_cols, b_pos, *, shape, flops_pad):
    n_rows, n_cols = shape
    row, col = _expand_from_padded(
        a_cols, a_pos, b_cols, b_pos, n_cols=n_cols, flops_pad=flops_pad
    )
    if d_cols is not None:
        # the SPA pre-seed analogue: D's stream joins the candidates
        # verbatim — its holes are already sentinels, its valid entries
        # dedup like any candidate (``SpGEMM_dor``, old/BSpGEMM.c:75-126)
        e_d = d_cols.shape[0]
        d_rows = _row_ids(d_pos, e_d)
        d_rows = jnp.where(d_cols < n_cols, d_rows, n_rows)
        row = jnp.concatenate([row, d_rows])
        col = jnp.concatenate([col, d_cols])
    return _sort_dedup_padded(row, col, n_rows, n_cols)


@functools.partial(jax.jit, static_argnames=("shape", "flops_pad"))
def _onesort_spgemm_jit(a_cols, a_pos, b_cols, b_pos, *, shape, flops_pad):
    return _onesort_core(
        None, None, a_cols, a_pos, b_cols, b_pos, shape=shape,
        flops_pad=flops_pad,
    )


@functools.partial(jax.jit, static_argnames=("shape", "flops_pad"))
def _onesort_spgemm_or_jit(
    d_cols, d_pos, a_cols, a_pos, b_cols, b_pos, *, shape, flops_pad
):
    return _onesort_core(
        d_cols, d_pos, a_cols, a_pos, b_cols, b_pos, shape=shape,
        flops_pad=flops_pad,
    )


@functools.partial(jax.jit, static_argnames=("shape", "flops_pad"))
def _onesort_spgemm_or_masked_jit(
    d_cols, d_pos, a_cols, a_pos, b_cols, b_pos, f_cols, f_pos,
    *, shape, flops_pad,
):
    n_rows, n_cols = shape
    row, col = _expand_from_padded(
        a_cols, a_pos, b_cols, b_pos, n_cols=n_cols, flops_pad=flops_pad
    )
    d_rows = _row_ids(d_pos, d_cols.shape[0])
    d_rows = jnp.where(d_cols < n_cols, d_rows, n_rows)
    f_rows = _row_ids(f_pos, f_cols.shape[0])
    f_rows = jnp.where(f_cols < n_cols, f_rows, n_rows)
    return _sort_dedup_padded_masked(
        row, col, d_rows, d_cols, f_rows, f_cols, n_rows, n_cols
    )


def spgemm_onesort_device(a, b, *, flops_pad: int) -> PaddedDeviceBCSR:
    """C = A·B structure, one sort, entirely on device.

    ``a``/``b`` may be :class:`DeviceBCSR` or :class:`PaddedDeviceBCSR` —
    padded operands are consumed as-is (their holes cost dead gather slots
    but no compaction).  ``flops_pad`` must upper-bound the PADDED span
    flop count (:func:`flops_bound_onesort`).
    """
    a, b = _as_padded(a), _as_padded(b)
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
    shape = (a.shape[0], b.shape[1])
    cols, pos, nnz = _onesort_spgemm_jit(
        a.cols, a.indptr_pos, b.cols, b.indptr_pos,
        shape=shape, flops_pad=flops_pad,
    )
    return PaddedDeviceBCSR(cols, pos, nnz, shape)


def spgemm_or_onesort_device(
    d, a, b, *, flops_pad: int, mask=None
) -> PaddedDeviceBCSR:
    """C = D OR (A·B), optionally D OR (mask .* (A·B)), one sort, entirely
    on device — the one-sort accumulation round (closure / k-hop / SPMD
    accumulators).

    Masked semantics match :func:`..device_api.spgemm_or_device`: D is
    unconditional, the mask applies only to the product term (PARITY.md
    O6).  ``mask``'s valid set must be canonical; a hole-y padded stream
    (e.g. a previous product) qualifies — its holes join the tagged sort
    as sentinels.  The mask's entries ride the output stream as extra
    in-span holes (never output), so masked rounds inflate the stream by
    the mask's length until the next ratio-gated compaction.
    """
    d, a, b = _as_padded(d), _as_padded(a), _as_padded(b)
    if a.shape[1] != b.shape[0] or tuple(d.shape) != (a.shape[0], b.shape[1]):
        raise ValueError(f"shape mismatch: D{d.shape} vs {a.shape} @ {b.shape}")
    shape = tuple(d.shape)
    if mask is not None:
        f = _as_padded(mask)
        if tuple(f.shape) != shape:
            raise ValueError(f"mask shape {f.shape} != {shape}")
        cols, pos, nnz = _onesort_spgemm_or_masked_jit(
            d.cols, d.indptr_pos, a.cols, a.indptr_pos,
            b.cols, b.indptr_pos, f.cols, f.indptr_pos,
            shape=shape, flops_pad=flops_pad,
        )
        return PaddedDeviceBCSR(cols, pos, nnz, shape)
    cols, pos, nnz = _onesort_spgemm_or_jit(
        d.cols, d.indptr_pos, a.cols, a.indptr_pos, b.cols, b.indptr_pos,
        shape=shape, flops_pad=flops_pad,
    )
    return PaddedDeviceBCSR(cols, pos, nnz, shape)


@functools.partial(jax.jit, static_argnames=("n_cols",))
def _flops_bound_jit(a_cols, b_pos, *, n_cols):
    valid = a_cols < n_cols
    acol = jnp.where(valid, a_cols, 0)
    span = jnp.where(valid, b_pos[acol + 1] - b_pos[acol], 0)
    # int32 exact value + an f32 overflow sentinel (int32 sums wrap)
    return jnp.sum(span, dtype=INT), jnp.sum(span.astype(jnp.float32))


def flops_bound_onesort(a, b) -> tuple[jax.Array, jax.Array]:
    """Traced padded-span flop bound of a·b (int32 exact, f32 estimate for
    the overflow guard).  Spans include b's holes — the real stream length
    the one-sort round will allocate."""
    a, b = _as_padded(a), _as_padded(b)
    return _flops_bound_jit(a.cols, b.indptr_pos, n_cols=b.shape[1])
