"""Sliced-ELLPACK SpGEMM engine: row-gather expansion instead of element gather.

The ESC engine's cost is dominated by the per-slot random gather
``b_indices[bidx]`` — measured 10.4 ns/element on a v5e chip, ~60% of the
multiply (benchmarks/micro.jsonl: ``gather_elem``), because XLA lowers
1-D random gather to a scalar loop.  XLA *is* fast at the embedding-lookup
pattern — gathering whole **rows** of a 2-D table.

This engine restructures the expansion around that primitive.  B is laid out
host-side as *sliced ELLPACK* (the classic GPU sparse format, re-purposed for
TPU gather efficiency): rows are grouped into width classes (eighth-octave
buckets), each class storing its rows densely as ``[n_rows_c, w_c]`` int32
with sentinel padding.  Expansion is then, per class:

    cand_cols = table_c[pos[e]]          # one row-gather per A-entry
    cand_rows = broadcast(row_of[e])     # no scan needed at all

Candidate (row, col) pairs flow into the same sort/compress machinery as the
ESC engine (with embedded row separators, ``sort_compress_seps``), so output
parity (ascending deduplicated columns, exclusive pointers —
final/SpGEMM_mpi_omp.c:47's sorted rows) is inherited.  The price is the
class padding (~1.06× slots on Poisson matrices, ~1.10× on R-MAT graphs);
the win is replacing the 10.4 ns/elem element gather with a ~row-granular
gather plus pure vector ops.

The layout plays the role of the reference's archived two-level blocked
CSR (``CSRbCSR``, old/utils.h:10-21) — a secondary operand format that
trades memory for a hardware-friendlier access pattern — re-designed around
what the TPU is actually fast at.
"""
from __future__ import annotations

import dataclasses
import functools
import weakref

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.bcsr import BCSR
from .spgemm import (
    INT,
    _stitch,
    pad_bucket,
    row_flops,
    sort_compress,
)

__all__ = ["EllB", "ell_spgemm", "EllSpGEMMExecutor", "width_bucket"]


def width_bucket(w: int) -> int:
    """Eighth-octave width class (multiples of 2^(k-3) within each octave).

    Was quarter-octave; eighth-octave shrinks the headline's class-width
    padding 1.17× → 1.06× (R-MAT s18 1.16× → 1.10×) for ~1.7× the class
    count — and expansion+sort cost scales with padded slots (measured 50%
    + 35% of the multiply, benchmarks/decompose.py)."""
    w = max(int(w), 1)
    p = 1 << (w - 1).bit_length()
    step = max(p // 8, 1)
    return ((w + step - 1) // step) * step


@dataclasses.dataclass
class EllB:
    """Host-built sliced-ELLPACK view of a BCSR matrix.

    ``widths[c]`` is class c's padded row width; ``tables[c]`` is the dense
    ``[n_rows_c, widths[c]]`` int32 index table, sentinel-padded with
    ``n_cols``; ``class_of_row``/``pos_in_class`` map global row id → class
    and slot.  Empty rows belong to no class (``class_of_row == -1``).
    """

    widths: list[int]
    tables: list[np.ndarray]
    class_of_row: np.ndarray  # int32 [n_rows], -1 for empty rows
    pos_in_class: np.ndarray  # int32 [n_rows]
    shape: tuple[int, int]

    @classmethod
    def build(
        cls, b: BCSR, group_widths: tuple[int, ...] | None = None
    ) -> "EllB":
        """Sliced-ELL layout of B.  ``group_widths`` (ascending) forces each
        row into the smallest listed width ≥ its own — the batched planner's
        DP class merge passes this to trade per-row width padding for fewer,
        fuller classes (per-chunk class pads are maxima, so many small
        classes inflate badly at high chunk counts)."""
        m = b.n_rows
        w = np.diff(b.indptr).astype(np.int64)
        nz = w > 0
        # vectorised eighth-octave bucket (≡ width_bucket)
        wb = np.zeros(m, np.int64)
        if nz.any():
            wn = w[nz]
            p = np.left_shift(
                1, np.frexp(wn.astype(np.float64) * 2 - 1)[1] - 1
            )  # smallest power of two >= wn
            step = np.maximum(p // 8, 1)
            wb[nz] = ((wn + step - 1) // step) * step
        if group_widths is not None and nz.any():
            gw = np.asarray(sorted(group_widths), np.int64)
            if wb[nz].max() > gw[-1]:
                raise ValueError(
                    f"group_widths {group_widths} do not cover width "
                    f"{int(wb[nz].max())}"
                )
            wb[nz] = gw[np.searchsorted(gw, wb[nz])]
        classes = np.unique(wb[nz]) if nz.any() else np.zeros(0, np.int64)
        class_of_row = np.full(m, -1, np.int32)
        pos_in_class = np.zeros(m, np.int32)
        widths: list[int] = []
        tables: list[np.ndarray] = []
        sentinel = b.n_cols
        if len(classes):
            # class id + stable in-class slot per nonempty row, vectorised
            # (slot order within a class = ascending global row, as before)
            rows_nz = np.flatnonzero(nz)
            ci_nz = np.searchsorted(classes, wb[nz]).astype(np.int32)
            class_of_row[rows_nz] = ci_nz
            order = np.argsort(ci_nz.astype(np.int16), kind="stable")
            counts = np.bincount(ci_nz, minlength=len(classes))
            starts = np.concatenate([[0], np.cumsum(counts[:-1])])
            pos_in_class[rows_nz[order]] = (
                np.arange(len(order), dtype=np.int64)
                - np.repeat(starts, counts)
            ).astype(np.int32)
            widths = [int(wc) for wc in classes]
            from ..native import table_fill

            tables = [
                np.empty((int(cnt), wc), np.int32)
                for cnt, wc in zip(counts, widths)
            ]
            # one parallel native pass over B's rows; numpy scatter fallback
            if not table_fill(
                b.indptr, b.indices, class_of_row, pos_in_class, tables,
                sentinel,
            ):
                for ci, wc in enumerate(widths):
                    rows = rows_nz[ci_nz == ci]
                    # entry e of class row k lands at tbl[k, offset]
                    lens = w[rows]
                    tbl = np.full((len(rows), wc), sentinel, np.int32)
                    dst_row = np.repeat(np.arange(len(rows)), lens)
                    dst_off = np.arange(
                        int(lens.sum()), dtype=np.int64
                    ) - np.repeat(np.cumsum(lens) - lens, lens)
                    src = _segment_sources(b.indptr, rows, lens)
                    tbl[dst_row, dst_off] = b.indices[src]
                    tables[ci] = tbl
        return cls(widths, tables, class_of_row, pos_in_class, tuple(b.shape))


def _segment_sources(
    indptr: np.ndarray, rows: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """Flat source positions of the CSR segments of ``rows`` (vectorised
    concatenation of ``arange(indptr[r], indptr[r+1])`` over r)."""
    total = int(lens.sum())
    out = np.ones(total, np.int64)
    starts = np.cumsum(lens) - lens
    out[starts] = indptr[rows] - np.concatenate(
        [[0], indptr[rows[:-1]] + lens[:-1] - 1]
    )
    return np.cumsum(out)


def _build_class_entries(
    a: BCSR, ell: EllB
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Partition A's entries by their B-row's width class (host, vectorised).

    Returns per-class ``(entry_rows, entry_pos)``: the output-row id and
    in-class B-row slot of every A-entry whose column belongs to the class.

    Native tier first (``native.class_partition``: one OpenMP stable
    counting-sort pass over the entries — ~0.85 s of numpy passes at
    nnz=8.4M become one parallel C pass); numpy fallback below is
    order-identical.
    """
    from ..native import class_partition

    out = class_partition(
        a.indptr, a.indices, ell.class_of_row, ell.pos_in_class,
        len(ell.widths),
    )
    if out is not None:
        return out
    entry_rows = np.repeat(
        np.arange(a.n_rows, dtype=np.int32), np.diff(a.indptr)
    )
    cls_of_entry = ell.class_of_row[a.indices]
    pos_of_entry = ell.pos_in_class[a.indices]
    # entries whose B row is empty belong to no class (class_of_row == -1)
    # and contribute no flops — drop them up front
    live = cls_of_entry >= 0
    if not live.all():
        entry_rows = entry_rows[live]
        cls_of_entry = cls_of_entry[live]
        pos_of_entry = pos_of_entry[live]
    # one stable sort by class instead of a boolean pass per class; within a
    # class the original CSR order (ascending row, file order within a row)
    # is preserved — the invariant assembly relies on.  int16 keys engage
    # numpy's radix path: 0.60 s -> 0.12 s at 8.4M entries (class count is
    # bounded by 8 eighth-octave buckets per doubling of width, << 2^15)
    order = np.argsort(cls_of_entry.astype(np.int16), kind="stable")
    cuts = np.concatenate(
        [[0], np.cumsum(np.bincount(cls_of_entry, minlength=len(ell.widths)))]
    )
    er_s, ep_s = entry_rows[order], pos_of_entry[order]
    rows_per_class = [
        er_s[cuts[ci] : cuts[ci + 1]] for ci in range(len(ell.widths))
    ]
    pos_per_class = [
        ep_s[cuts[ci] : cuts[ci + 1]] for ci in range(len(ell.widths))
    ]
    return rows_per_class, pos_per_class


def _expand_class(
    table: jax.Array,  # [nc, w] int32, sentinel-padded with n_cols
    entry_rows: jax.Array,  # [ec_pad] int32, sentinel n_rows beyond n_valid
    entry_pos: jax.Array,  # [ec_pad] or inlined [ec_pad*w] int32
    n_rows: int,
    n_cols: int,
    w: int = 1,
) -> tuple[jax.Array, jax.Array]:
    if table is None:  # inlined class: entry_pos IS B's row values
        cols = entry_pos.reshape(-1, w)
    else:
        cols = table[entry_pos]  # [ec_pad, w] — THE row-gather
    rows = jnp.broadcast_to(entry_rows[:, None], cols.shape)
    valid = (cols < n_cols) & (rows < n_rows)
    rows = jnp.where(valid, rows, n_rows)
    cols = jnp.where(valid, cols, n_cols)
    return rows.reshape(-1), cols.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
        "out_pad",
    ),
)
def _ell_spgemm_jit(
    tables: tuple[jax.Array, ...],
    entry_rows: tuple[jax.Array, ...],  # per class, stacked [n_chunks, pad_c]
    entry_pos: tuple[jax.Array, ...],
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
    out_pad: int | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """All row chunks unrolled in ONE program (chunk k+1's gathers overlap
    chunk k's sorts under XLA's scheduler; one dispatch total).  Row ids are
    chunk-local, so when ``packable(rows_pad, n_cols)`` holds every chunk's
    sort runs on single packed int32 keys (~30% cheaper than 2-key).

    ``out_pad`` truncates each chunk's compacted index array (valid entries
    ≤ true chunk flops ≤ out_pad ≤ sort_pad) so the stacked outputs of many
    chunks don't hold the sort padding resident."""
    outs = [
        sort_compress(row, col, rows_pad, n_cols)
        for row, col in _chunk_pair_streams(
            tables, entry_rows, entry_pos, n_chunks=n_chunks,
            rows_pad=rows_pad, n_cols=n_cols,
            widths=widths, pads=pads, sort_pad=sort_pad,
        )
    ]
    if out_pad is not None and out_pad < sort_pad:
        outs = [(p, i[:out_pad], n) for p, i, n in outs]
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(3))


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
        "out_pad",
    ),
)
def _ell_spgemm_sep_jit(
    tables: tuple[jax.Array, ...],
    entry_rows: tuple[jax.Array, ...],  # per class, stacked [n_chunks, pad_c]
    entry_pos: tuple[jax.Array, ...],
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
    out_pad: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """:func:`_ell_spgemm_jit` with **embedded row separators**
    (``sort_compress_seps``): no device row-pointer pass at all — one
    synthetic ``(r, n_cols)`` candidate per chunk row rides the sort and the
    host reads pointers off the separator positions (``split_seps``).
    Measured: the searchsorted/histogram stage was ~10 ms of the 70 ms
    headline (benchmarks/decompose.py); separators cost rows_pad extra sort
    slots per chunk (~0.3%).

    NOTE (measured rejection, ab="key-stream-1d" 2026-08-21): the 2-D
    key-stream assembly does NOT transfer to this unrolled 1-D form —
    emitting packed keys per class piece measured rmat-s18 2.10 → 2.37 s
    (+12.7%, same-window, streams element-equal).  At multi-million-slot
    1-D lengths XLA fuses the single full-stream pack into the sort's
    first pass better than per-piece packing, so the pair form stays."""
    from .spgemm import sort_compress_seps

    sep_rows = jnp.arange(rows_pad, dtype=INT)
    sep_cols = jnp.full((rows_pad,), n_cols, INT)
    outs = []
    for row, col in _chunk_pair_streams(
        tables, entry_rows, entry_pos, n_chunks=n_chunks,
        rows_pad=rows_pad, n_cols=n_cols,
        widths=widths, pads=pads, sort_pad=sort_pad - rows_pad,
    ):
        outs.append(
            sort_compress_seps(
                jnp.concatenate([row, sep_rows]),
                jnp.concatenate([col, sep_cols]),
                rows_pad, n_cols,
            )
        )
    if out_pad is not None and out_pad < sort_pad:
        outs = [(i[:out_pad], n) for i, n in outs]
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(2))


def _expand_class_2d(
    table: jax.Array,  # [nc, w] int32, sentinel-padded with n_cols
    entry_rows: jax.Array,  # [k, ec_pad] int32, sentinel rows_pad beyond valid
    entry_pos: jax.Array,  # [k, ec_pad] or inlined [k, ec_pad*w] int32
    rows_pad: int,
    n_cols: int,
    w: int = 1,
    shift: int | None = None,
) -> tuple[jax.Array, jax.Array] | jax.Array:
    """Batched :func:`_expand_class`: all k chunks' gathers in one op.

    With ``shift`` (the packed-key column-field width), emits the packed
    int32 key stream ``(row << shift) | col`` directly — ONE ``[k, slots]``
    array instead of separate row/col streams, with invalid slots at the
    sentinel key ``(rows_pad << shift) | n_cols`` (element-identical to
    packing the pair streams after the fact, so bit-exactness is by
    construction).  Halves the assembled stream's HBM traffic.

    NOTE (measured rejection, 2026-08-20): a w-major rewrite — strided
    de-interleave for inlined classes, transposed-table ``take`` for
    gathered ones, minor dims kept wide to dodge the 128-lane tile padding
    of ``[k, pad, w]`` intermediates — halved PER-CLASS synthetic costs
    (ab="expand-class": inlined w=2 8.7→4.3 ms, gathered w14 4.5→~1) but
    measured NO change end-to-end (hypersparse 0.0742 vs 0.0744, 256k/64k
    flat; variant="wmajor-expand") — XLA already fuses the where/broadcast
    chain into the gather here — and ``jnp.take``'s default out-of-bounds
    'fill' mode silently DROPPED 2753 entries at 256k (indexing clamps;
    take fills) until pinned with mode="clip".  Kept in the simple proven
    form; the expansion remains hypersparse's dominant device cost
    (25 of 47 ms ex-floor, decomp2 rows) for a future structural attack.
    """
    if table is None:  # inlined class: entry_pos IS B's row values
        k = entry_rows.shape[0]
        cols = entry_pos.reshape(k, -1, w)
    else:
        cols = table[entry_pos]  # [k, ec_pad, w] — THE row-gather, batched
    rows = jnp.broadcast_to(entry_rows[..., None], cols.shape)
    valid = (cols < n_cols) & (rows < rows_pad)
    k = entry_rows.shape[0]
    if shift is not None:
        sentinel = (rows_pad << shift) | n_cols
        key = jnp.where(valid, (rows << shift) | cols, sentinel)
        return key.reshape(k, -1)
    rows = jnp.where(valid, rows, rows_pad)
    cols = jnp.where(valid, cols, n_cols)
    return rows.reshape(k, -1), cols.reshape(k, -1)


def _assemble_stream_2d(
    tables,
    entry_rows,
    entry_pos,
    k: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
    extra: tuple = (),
    shift: int | None = None,
) -> tuple[jax.Array, jax.Array] | jax.Array:
    """The batched engine's ``[k, sort_pad]`` candidate stream: per-class
    expansions (:func:`_expand_class_2d`), optional extra (row, col) pair
    blocks (fused-OR D operands), one ``(r, n_cols)`` separator per chunk
    row, and sentinel fill up to ``sort_pad``.  Shared by every batched
    kernel (plain/masked/counts/or).

    With ``shift`` the stream is assembled DIRECTLY as packed int32 keys
    (one ``[k, sort_pad]`` array; see :func:`_expand_class_2d`) — the
    element-wise pack that used to run as a separate full-stream pass over
    both pair arrays fuses into each piece's producer instead.  Measured
    (ab="key-stream", 2026-08-21, streams element-identical + bit-exact vs
    scipy): device mid-64k 28.7→24.3 ms (−15%), hypersparse 29.2→26.8
    (−8%), large-1m 92.9→89.8, mid-256k tie (106.3/106.7 — sort-dominated
    there)."""
    total = (
        sum(p * w for p, w in zip(pads, widths))
        + rows_pad
        + sum(int(er.shape[1]) for er, _ in extra)
    )
    fill = sort_pad - total
    # NOTE: the separator and sentinel-fill tails stay SEPARATE pieces on
    # purpose — merging them into one arange-derived broadcast measured
    # hypersparse 0.0772 -> 0.0812 (variant="piece-cost-v2", 2026-08-20):
    # the wide fill piece is a splat constant XLA lowers as a memset, and
    # folding it into a non-splat piece forfeits that fast path.
    if shift is not None:
        sentinel = (rows_pad << shift) | n_cols
        parts = [
            _expand_class_2d(t, er, ep, rows_pad, n_cols, w, shift=shift)
            for t, er, ep, w in zip(tables, entry_rows, entry_pos, widths)
        ]
        parts.extend((er << shift) | ec for er, ec in extra)
        parts.append(
            jnp.broadcast_to(
                (jnp.arange(rows_pad, dtype=INT) << shift) | n_cols,
                (k, rows_pad),
            )
        )
        if fill:
            parts.append(jnp.full((k, fill), sentinel, INT))
        return jnp.concatenate(parts, axis=1)
    parts_r, parts_c = [], []
    for t, er, ep, w in zip(tables, entry_rows, entry_pos, widths):
        r, c = _expand_class_2d(t, er, ep, rows_pad, n_cols, w)
        parts_r.append(r)
        parts_c.append(c)
    for er, ec in extra:
        parts_r.append(er)
        parts_c.append(ec)
    parts_r.append(
        jnp.broadcast_to(
            jnp.arange(rows_pad, dtype=INT)[None, :], (k, rows_pad)
        )
    )
    parts_c.append(jnp.full((k, rows_pad), n_cols, INT))
    if fill:
        parts_r.append(jnp.full((k, fill), rows_pad, INT))
        parts_c.append(jnp.full((k, fill), n_cols, INT))
    return jnp.concatenate(parts_r, axis=1), jnp.concatenate(parts_c, axis=1)


def _staged_pairs_2d(ptr, idx, rows_pad: int, n_cols: int):
    """Batched :func:`_staged_pairs`: sentinel-masked (row, col) pairs of the
    stacked chunk-local CSR side operands (mask / fused-OR D), ``[k, P]``.
    Row ids per entry via a batched owner scan (scatter-max + cummax along
    axis -1, ≡ ``_owner_scan``)."""
    k, P = idx.shape
    lengths = ptr[:, 1:] - ptr[:, :-1]
    ids = jnp.broadcast_to(
        jnp.arange(lengths.shape[1], dtype=INT)[None, :], lengths.shape
    )
    dst = jnp.where(lengths > 0, ptr[:, :-1], P)
    seg = jnp.zeros((k, P), INT).at[
        jnp.arange(k, dtype=INT)[:, None], dst
    ].max(ids, mode="drop")
    r = jax.lax.cummax(seg, axis=1)
    v = jnp.arange(P, dtype=INT)[None, :] < ptr[:, -1:]
    return jnp.where(v, r, rows_pad), jnp.where(v, idx, n_cols)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
        "out_pad",
    ),
)
def _ell_spgemm_sep2d_jit(
    tables: tuple[jax.Array, ...],
    entry_rows: tuple[jax.Array, ...],  # per class, stacked [n_chunks, pad_c]
    entry_pos: tuple[jax.Array, ...],
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
    out_pad: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Batched form of :func:`_ell_spgemm_sep_jit`: ALL chunks ride ONE
    ``[n_chunks, sort_pad]`` array and the sorts run along axis -1
    (``sort_compress_seps_2d``).

    Two structural wins over the unrolled 1-D form (benchmarks/micro.jsonl,
    bench "sort2d"): per-element sort cost drops with the row length
    (1.11 ns at L=4096 vs 2.15 at 2^25), and chunk-local row ids stay small
    enough for packed single-int32 keys at any matrix size (the unrolled
    engine went 2-key above ~2^14 rows because more chunks meant more
    compiled program).  Chunk count is no longer a compile-size concern —
    it is one stacked tensor op regardless of k.
    """
    from .spgemm import (
        packable, sort_compress_seps_2d, sort_compress_seps_2d_keys,
    )

    if packable(rows_pad, n_cols):
        key = _assemble_stream_2d(
            tables, entry_rows, entry_pos, n_chunks, rows_pad, n_cols,
            widths, pads, sort_pad, shift=int(n_cols).bit_length(),
        )
        idx, nnz = sort_compress_seps_2d_keys(key, rows_pad, n_cols)
    else:
        row, col = _assemble_stream_2d(
            tables, entry_rows, entry_pos, n_chunks, rows_pad, n_cols,
            widths, pads, sort_pad,
        )
        idx, nnz = sort_compress_seps_2d(row, col, rows_pad, n_cols)
    if out_pad is not None and out_pad < sort_pad:
        idx = idx[:, :out_pad]
    return idx, nnz


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
    ),
)
def _ell_spgemm_padded2d_jit(
    tables: tuple[jax.Array, ...],
    entry_rows: tuple[jax.Array, ...],
    entry_pos: tuple[jax.Array, ...],
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
) -> tuple[jax.Array, jax.Array]:
    """ONE-SORT variant of :func:`_ell_spgemm_sep2d_jit`: stops after the
    dedup-demote, returning the sorted-with-holes PACKED KEY stream
    (``int32 max`` holes) plus per-chunk valid counts — the compaction
    moves to the host (:meth:`EllSpGEMMExecutor.assemble_padded`).

    Measured (ab="one-sort", 2026-08-20, bit-exact): dropping the second
    sort halves device time at mid-64k (34.9 -> 17.3 ms) and cuts 33% at
    mid-256k — the fast path when the consumer tolerates a padded pull
    (PCIe-attached hosts; this environment's ~25 MB/s tunnel makes the
    compacted default win e2e above 64k).  Requires packed keys
    (``packable(rows_pad, n_cols)`` — always true for batched plans, which
    cap rows per bin exactly to keep keys packed)."""
    from .bitonic import sort_rows as sort_rows_1key
    from .spgemm import packable

    if not packable(rows_pad, n_cols):  # pragma: no cover - plans guarantee
        raise ValueError("run_padded requires packed keys")
    shift = int(n_cols).bit_length()
    key = _assemble_stream_2d(
        tables, entry_rows, entry_pos, n_chunks, rows_pad, n_cols,
        widths, pads, sort_pad, shift=shift,
    )
    limit = rows_pad << shift
    key_s = sort_rows_1key(key)
    prev = jnp.concatenate(
        [jnp.full((n_chunks, 1), -1, INT), key_s[:, :-1]], axis=1
    )
    keep = (key_s != prev) & (key_s < limit)
    nnz = jnp.sum(keep, axis=1, dtype=INT)
    demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max)
    return demoted, nnz


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
    ),
)
def _ell_masked2d_jit(
    tables,
    entry_rows,
    entry_pos,
    f_ptr,  # [k, rows_pad+1] chunk-local mask row pointers
    f_idx,  # [k, f_pad] mask indices (canonical, fill = n_cols)
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
):
    """Batched :func:`_ell_masked_jit`: the sort-fused mask join over the
    single stacked ``[k, sort_pad]`` candidate stream
    (:func:`..spgemm.sort_compress_masked_seps_2d`).  Valid entries per
    chunk never exceed mask nnz + separators, so the stacked output
    truncates to ``f_pad + rows_pad``.  ≡ final/SpGEMM_mpi_omp.c:232-288."""
    from .spgemm import (
        packable, sort_compress_masked_seps_2d,
        sort_compress_masked_seps_2d_keys,
    )

    f_row, f_col = _staged_pairs_2d(f_ptr, f_idx, rows_pad, n_cols)
    if packable(rows_pad, 2 * n_cols + 1):
        key = _assemble_stream_2d(
            tables, entry_rows, entry_pos, n_chunks, rows_pad, n_cols,
            widths, pads, sort_pad, shift=int(n_cols).bit_length(),
        )
        idx, nnz = sort_compress_masked_seps_2d_keys(
            key, f_row, f_col, rows_pad, n_cols
        )
    else:
        row, col = _assemble_stream_2d(
            tables, entry_rows, entry_pos, n_chunks, rows_pad, n_cols,
            widths, pads, sort_pad,
        )
        idx, nnz = sort_compress_masked_seps_2d(
            row, col, f_row, f_col, rows_pad, n_cols
        )
    return idx[:, : f_idx.shape[-1] + rows_pad], nnz


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
        "out_pad",
    ),
)
def _ell_counts2d_jit(
    tables,
    entry_rows,
    entry_pos,
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
    out_pad: int | None = None,
):
    """Batched :func:`_ell_counts_jit`: multiplicities ride the stacked
    axis-(-1) compaction sorts as a cumsum payload
    (:func:`..counts.sort_compress_counts_seps_2d`); row pointers ride as
    embedded separators (their count slots are dropped host-side)."""
    from .counts import (
        sort_compress_counts_seps_2d, sort_compress_counts_seps_2d_keys,
    )
    from .spgemm import packable

    if packable(rows_pad, n_cols):
        key = _assemble_stream_2d(
            tables, entry_rows, entry_pos, n_chunks, rows_pad, n_cols,
            widths, pads, sort_pad, shift=int(n_cols).bit_length(),
        )
        idx, cnt, nnz = sort_compress_counts_seps_2d_keys(
            key, rows_pad, n_cols
        )
    else:
        row, col = _assemble_stream_2d(
            tables, entry_rows, entry_pos, n_chunks, rows_pad, n_cols,
            widths, pads, sort_pad,
        )
        idx, cnt, nnz = sort_compress_counts_seps_2d(
            row, col, rows_pad, n_cols
        )
    if out_pad is not None and out_pad < sort_pad:
        idx = idx[:, :out_pad]
        cnt = cnt[:, :out_pad]
    return idx, cnt, nnz


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
    ),
)
def _ell_masked_counts2d_jit(
    tables,
    entry_rows,
    entry_pos,
    f_ptr,
    f_idx,
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
):
    """Batched :func:`_ell_masked_counts_jit`
    (:func:`..counts.masked_counts_compress_seps_2d` over the stacked
    stream); output truncates to mask pad + separators."""
    from .counts import (
        masked_counts_compress_seps_2d, masked_counts_compress_seps_2d_keys,
    )
    from .spgemm import packable

    f_row, f_col = _staged_pairs_2d(f_ptr, f_idx, rows_pad, n_cols)
    if packable(rows_pad, 2 * n_cols + 1):
        key = _assemble_stream_2d(
            tables, entry_rows, entry_pos, n_chunks, rows_pad, n_cols,
            widths, pads, sort_pad, shift=int(n_cols).bit_length(),
        )
        idx, cnt, nnz = masked_counts_compress_seps_2d_keys(
            key, f_row, f_col, rows_pad, n_cols
        )
    else:
        row, col = _assemble_stream_2d(
            tables, entry_rows, entry_pos, n_chunks, rows_pad, n_cols,
            widths, pads, sort_pad,
        )
        idx, cnt, nnz = masked_counts_compress_seps_2d(
            row, col, f_row, f_col, rows_pad, n_cols
        )
    cut = f_idx.shape[-1] + rows_pad
    return idx[:, :cut], cnt[:, :cut], nnz


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
    ),
)
def _ell_counts_sum2d_jit(
    tables,
    entry_rows,
    entry_pos,
    f_ptr,
    f_idx,
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
):
    """Batched :func:`_ell_counts_sum_jit`: one int32 wedge-sum scalar per
    chunk (:func:`..counts.masked_counts_sum_2d`); stream separators are
    inert (their column never matches a mask pair)."""
    from .counts import masked_counts_sum_2d, masked_counts_sum_2d_keys
    from .spgemm import packable

    f_row, f_col = _staged_pairs_2d(f_ptr, f_idx, rows_pad, n_cols)
    if packable(rows_pad, 2 * n_cols + 1):
        key = _assemble_stream_2d(
            tables, entry_rows, entry_pos, n_chunks, rows_pad, n_cols,
            widths, pads, sort_pad, shift=int(n_cols).bit_length(),
        )
        return masked_counts_sum_2d_keys(
            key, f_row, f_col, rows_pad, n_cols
        )
    row, col = _assemble_stream_2d(
        tables, entry_rows, entry_pos, n_chunks, rows_pad, n_cols,
        widths, pads, sort_pad,
    )
    return masked_counts_sum_2d(row, col, f_row, f_col, rows_pad, n_cols)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
        "out_pad",
    ),
)
def _ell_or2d_jit(
    tables,
    entry_rows,
    entry_pos,
    d_ptr,
    d_idx,
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
    out_pad: int | None = None,
):
    """Batched :func:`_ell_or_jit`: D's chunk-local pairs join the stacked
    stream before the axis-(-1) sort (the SPA pre-seed analogue,
    ≡ ``SpGEMM_dor``, old/BSpGEMM.c:75-126)."""
    from .spgemm import (
        packable, sort_compress_seps_2d, sort_compress_seps_2d_keys,
    )

    d_rows, d_cols = _staged_pairs_2d(d_ptr, d_idx, rows_pad, n_cols)
    if packable(rows_pad, n_cols):
        key = _assemble_stream_2d(
            tables, entry_rows, entry_pos, n_chunks, rows_pad, n_cols,
            widths, pads, sort_pad, extra=((d_rows, d_cols),),
            shift=int(n_cols).bit_length(),
        )
        idx, nnz = sort_compress_seps_2d_keys(key, rows_pad, n_cols)
    else:
        row, col = _assemble_stream_2d(
            tables, entry_rows, entry_pos, n_chunks, rows_pad, n_cols,
            widths, pads, sort_pad, extra=((d_rows, d_cols),),
        )
        idx, nnz = sort_compress_seps_2d(row, col, rows_pad, n_cols)
    if out_pad is not None and out_pad < sort_pad:
        idx = idx[:, :out_pad]
    return idx, nnz


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
    ),
)
def _ell_or_masked2d_jit(
    tables,
    entry_rows,
    entry_pos,
    d_ptr,
    d_idx,
    f_ptr,
    f_idx,
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
):
    """Batched :func:`_ell_or_masked_jit`: the three-way tagged join
    (mask < D < candidate) along axis -1 with embedded row separators
    (:func:`..fused._sort_compress_or_masked_seps_2d`);
    ≡ ``SpGEMM_dor_masked``, old/BSpGEMM.c:185-254."""
    from .fused import (
        _sort_compress_or_masked_seps_2d, _sort_compress_or_masked_seps_2d_keys,
    )
    from .spgemm import packable

    d_rows, d_cols = _staged_pairs_2d(d_ptr, d_idx, rows_pad, n_cols)
    f_rows, f_cols = _staged_pairs_2d(f_ptr, f_idx, rows_pad, n_cols)
    if packable(rows_pad, 4 * n_cols + 3):
        key = _assemble_stream_2d(
            tables, entry_rows, entry_pos, n_chunks, rows_pad, n_cols,
            widths, pads, sort_pad, shift=int(n_cols).bit_length(),
        )
        idx, nnz = _sort_compress_or_masked_seps_2d_keys(
            key, d_rows, d_cols, f_rows, f_cols, rows_pad, n_cols
        )
    else:
        row, col = _assemble_stream_2d(
            tables, entry_rows, entry_pos, n_chunks, rows_pad, n_cols,
            widths, pads, sort_pad,
        )
        idx, nnz = _sort_compress_or_masked_seps_2d(
            row, col, d_rows, d_cols, f_rows, f_cols, rows_pad, n_cols
        )
    return idx[:, : d_idx.shape[-1] + f_idx.shape[-1] + rows_pad], nnz


def _chunk_pair_streams(
    tables,
    entry_rows,  # per-class stacked [n_chunks, pad_c]
    entry_pos,
    *,
    n_chunks,
    rows_pad,
    n_cols,
    widths,
    pads,
    sort_pad,
):
    """Per-chunk padded candidate (row, col) streams (shared by the plain and
    masked engines).  Entries arrive stacked per class — one device array per
    (class, group) instead of per (class, chunk); ~1000 host device_puts per
    executor build measured 0.26 s of a 0.68 s construction before stacking."""
    total = sum(p * w for p, w in zip(pads, widths))
    fill = sort_pad - total
    streams = []
    for k in range(n_chunks):
        parts_r, parts_c = [], []
        for t, er, ep, w in zip(tables, entry_rows, entry_pos, widths):
            r, c = _expand_class(t, er[k], ep[k], rows_pad, n_cols, w)
            parts_r.append(r)
            parts_c.append(c)
        if fill or not parts_r:  # fill == 0 with no classes: keep concat fed
            parts_r.append(jnp.full((fill,), rows_pad, INT))
            parts_c.append(jnp.full((fill,), n_cols, INT))
        streams.append((jnp.concatenate(parts_r), jnp.concatenate(parts_c)))
    return streams


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
        "out_pad",
    ),
)
def _ell_counts_jit(
    tables,
    entry_rows,  # per class, stacked [n_chunks, pad_c]
    entry_pos,
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
    out_pad: int | None = None,
):
    """Counting variant of :func:`_ell_spgemm_jit`: each chunk's candidate
    stream runs :func:`..counts.sort_compress_counts` (multiplicities ride
    the compaction sort as a cumsum payload), returning stacked chunk-local
    ``(c_indptr, c_indices, c_counts, nnz)``.  No embedded separators — the
    counts payload already pays the extra sort lane, and the indptr
    histogram is cheap relative to it."""
    from .counts import sort_compress_counts

    outs = [
        sort_compress_counts(row, col, rows_pad, n_cols)
        for row, col in _chunk_pair_streams(
            tables, entry_rows, entry_pos, n_chunks=n_chunks,
            rows_pad=rows_pad, n_cols=n_cols,
            widths=widths, pads=pads, sort_pad=sort_pad,
        )
    ]
    if out_pad is not None and out_pad < sort_pad:
        outs = [(p, i[:out_pad], c[:out_pad], n) for p, i, c, n in outs]
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(4))


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
    ),
)
def _ell_masked_counts_jit(
    tables,
    entry_rows,  # per class, stacked [n_chunks, pad_c]
    entry_pos,
    f_ptr,  # [k, rows_pad+1] chunk-local mask row pointers
    f_idx,  # [k, f_nnz_pad] mask indices (canonical, fill = n_cols)
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
):
    """Masked counting multiply C = F .* (A·B) with multiplicities over the
    sliced-ELL candidate stream (:func:`..counts.masked_counts_compress`).
    Valid entries per chunk never exceed the mask's nnz, so the stacked
    outputs truncate to the mask pad."""
    from .counts import masked_counts_compress

    f_pad = f_idx.shape[-1]
    outs = []
    for k, (row, col) in enumerate(
        _chunk_pair_streams(
            tables, entry_rows, entry_pos, n_chunks=n_chunks,
            rows_pad=rows_pad, n_cols=n_cols,
            widths=widths, pads=pads, sort_pad=sort_pad,
        )
    ):
        p, i, c, n = masked_counts_compress(
            row, col, f_ptr[k], f_idx[k], f_ptr[k][-1], rows_pad, n_cols
        )
        outs.append((p, i[:f_pad], c[:f_pad], n))
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(4))


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
    ),
)
def _ell_counts_sum_jit(
    tables,
    entry_rows,  # per class, stacked [n_chunks, pad_c]
    entry_pos,
    f_ptr,
    f_idx,
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
):
    """Σ over mask entries of candidate multiplicity, one int32 scalar per
    chunk (:func:`..counts.masked_counts_sum` over the sliced-ELL stream) —
    the triangle-count kernel: nothing but ``n_chunks`` scalars leaves the
    device."""
    from .counts import masked_counts_sum

    sums = [
        masked_counts_sum(
            row, col, f_ptr[k], f_idx[k], f_ptr[k][-1], rows_pad, n_cols
        )
        for k, (row, col) in enumerate(
            _chunk_pair_streams(
                tables, entry_rows, entry_pos, n_chunks=n_chunks,
                rows_pad=rows_pad, n_cols=n_cols,
                widths=widths, pads=pads, sort_pad=sort_pad,
            )
        )
    ]
    return jnp.stack(sums)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad"
    ),
)
def _ell_masked_jit(
    tables,
    entry_rows,  # per class, stacked [n_chunks, pad_c]
    entry_pos,
    f_ptr,  # [k, rows_pad+1] chunk-local mask row pointers
    f_idx,  # [k, f_nnz_pad] mask indices (canonical, fill = n_cols)
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
):
    """Masked variant: C = F .* (A·B) — the mask join is fused into the sort
    (``sort_compress_masked_seps``: mask pairs enter the candidate stream
    tagged to sort first within a pair; a candidate survives iff its
    predecessor is its pair's mask entry).  Replaces the per-slot bisection,
    whose log2(width) random gathers cost ~25× the whole unmasked multiply
    (measured 1.78 s vs 0.072 s on n=64K d=16).  Row pointers ride as
    embedded separators (see ``_ell_spgemm_sep_jit``).  Bit-exact with the
    reference's ``SpGEMM_masked`` (final/SpGEMM_mpi_omp.c:232-288)."""
    from .spgemm import _row_ids, sort_compress_masked_seps

    sep_rows = jnp.arange(rows_pad, dtype=INT)
    sep_cols = jnp.full((rows_pad,), n_cols, INT)
    outs = []
    for k, (row, col) in enumerate(
        _chunk_pair_streams(
            tables, entry_rows, entry_pos, n_chunks=n_chunks,
            rows_pad=rows_pad, n_cols=n_cols,
            widths=widths, pads=pads, sort_pad=sort_pad - rows_pad,
        )
    ):
        f_rows = _row_ids(f_ptr[k], f_idx[k].shape[0])
        outs.append(
            sort_compress_masked_seps(
                jnp.concatenate([row, sep_rows]),
                jnp.concatenate([col, sep_cols]),
                f_rows, f_idx[k], f_ptr[k][-1], rows_pad, n_cols,
            )
        )
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(2))


def _staged_pairs(ptr, idx, rows_pad: int, n_cols: int):
    """Sentinel-masked (row, col) pairs of one staged chunk-local CSR operand
    (mask / fused-OR D): slots past ``ptr[-1]`` become (rows_pad, n_cols)
    padding sentinels."""
    from .spgemm import _row_ids

    pad = idx.shape[-1]
    r = _row_ids(ptr, pad)
    v = jnp.arange(pad, dtype=INT) < ptr[-1]
    return jnp.where(v, r, rows_pad), jnp.where(v, idx, n_cols)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad",
        "out_pad",
    ),
)
def _ell_or_jit(
    tables,
    entry_rows,  # per class, stacked [n_chunks, pad_c]
    entry_pos,
    d_ptr,  # [k, rows_pad+1] chunk-local D row pointers
    d_idx,  # [k, d_pad] D indices (canonical, fill = n_cols)
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
    out_pad: int | None = None,
):
    """Fused union-product C = D OR (A·B): D's chunk-local pairs join each
    chunk's candidate stream before the sort — the SPA pre-seed analogue
    (≡ ``SpGEMM_dor``, old/BSpGEMM.c:75-126) — and the union IS the sort's
    dedup.  Row pointers ride as embedded separators
    (see :func:`_ell_spgemm_sep_jit`)."""
    from .spgemm import sort_compress_seps

    d_pad = d_idx.shape[-1]
    sep_rows = jnp.arange(rows_pad, dtype=INT)
    sep_cols = jnp.full((rows_pad,), n_cols, INT)
    outs = []
    for k, (row, col) in enumerate(
        _chunk_pair_streams(
            tables, entry_rows, entry_pos, n_chunks=n_chunks,
            rows_pad=rows_pad, n_cols=n_cols,
            widths=widths, pads=pads, sort_pad=sort_pad - rows_pad - d_pad,
        )
    ):
        d_rows, d_cols = _staged_pairs(d_ptr[k], d_idx[k], rows_pad, n_cols)
        outs.append(
            sort_compress_seps(
                jnp.concatenate([row, d_rows, sep_rows]),
                jnp.concatenate([col, d_cols, sep_cols]),
                rows_pad, n_cols,
            )
        )
    if out_pad is not None and out_pad < sort_pad:
        outs = [(i[:out_pad], n) for i, n in outs]
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(2))


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad"
    ),
)
def _ell_or_masked_jit(
    tables,
    entry_rows,  # per class, stacked [n_chunks, pad_c]
    entry_pos,
    d_ptr,
    d_idx,
    f_ptr,
    f_idx,
    *,
    n_chunks: int,
    rows_pad: int,
    n_cols: int,
    widths: tuple[int, ...],
    pads: tuple[int, ...],
    sort_pad: int,
):
    """Masked fused-OR C = D OR (F .* (A·B)): the three-way tagged sort-join
    of ``_sort_compress_or_masked`` (mask < D < candidate within a (row, col)
    run — ≡ ``SpGEMM_dor_masked``, old/BSpGEMM.c:185-254) over the sliced-ELL
    candidate stream.  Returns stacked chunk-local ``(indptr, indices, nnz)``
    (no separators — the join's compaction already pays the demote re-sort,
    and separators cannot ride a 2-bit-tagged key unambiguously)."""
    from .fused import _sort_compress_or_masked

    outs = []
    for k, (row, col) in enumerate(
        _chunk_pair_streams(
            tables, entry_rows, entry_pos, n_chunks=n_chunks,
            rows_pad=rows_pad, n_cols=n_cols,
            widths=widths, pads=pads, sort_pad=sort_pad,
        )
    ):
        d_rows, d_cols = _staged_pairs(d_ptr[k], d_idx[k], rows_pad, n_cols)
        f_rows, f_cols = _staged_pairs(f_ptr[k], f_idx[k], rows_pad, n_cols)
        outs.append(
            _sort_compress_or_masked(
                row, col, d_rows, d_cols, f_rows, f_cols, rows_pad, n_cols
            )
        )
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(3))


def _unpack_tables(tables_flat: jax.Array, table_shapes) -> tuple:
    """Rebuild the per-class ELL tables from their flat concatenation —
    inside jit, so staging uploads ONE array instead of one per class
    (each host→device transfer through this environment's tunnel costs
    ~13-30 ms regardless of size; ~300 staged leaves measured 3.2 s of a
    3.4 s executor build)."""
    out, off = [], 0
    for shape in table_shapes:
        if shape is None:  # inlined width-1 class: no table bytes at all
            out.append(None)
            continue
        r, w = shape
        out.append(
            jax.lax.slice(tables_flat, (off,), (off + r * w,)).reshape(r, w)
        )
        off += r * w
    return tuple(out)


def _unpack_entries(er_all, ep_all, row0, g: int, pads, ep_spans) -> tuple:
    """Slice one dispatch group's rows out of the full stacked entry arrays
    (traced ``row0`` → one compile serves every group) and split the class
    column spans (static).  ``ep_spans`` differ from ``pads`` for INLINED
    classes, whose staged values occupy ``pad*w`` columns."""
    er_g = jax.lax.dynamic_slice(er_all, (row0, 0), (g, er_all.shape[1]))
    ep_g = jax.lax.dynamic_slice(ep_all, (row0, 0), (g, ep_all.shape[1]))
    ers, eps, off_r, off_p = [], [], 0, 0
    for pad, span in zip(pads, ep_spans):
        ers.append(jax.lax.slice(er_g, (0, off_r), (g, off_r + pad)))
        eps.append(jax.lax.slice(ep_g, (0, off_p), (g, off_p + span)))
        off_r += pad
        off_p += span
    return tuple(ers), tuple(eps)


def _make_flat_kernel(inner):
    """Wrap a tuple-interface ELL kernel as a flat-staging kernel: takes the
    single concatenated tables/entries arrays plus a traced group offset,
    unpacks inside the SAME jit, and forwards.  Extra per-group operand
    arrays (masks, fused-OR D) are sliced by the same traced offset."""

    @functools.partial(
        jax.jit,
        static_argnames=(
            "table_shapes", "n_chunks", "rows_pad", "n_cols", "widths",
            "pads", "sort_pad", "extra_kw",
        ),
    )
    def runner(
        tables_flat, er_all, ep_all, row0, *extra_arrays,
        table_shapes, n_chunks, rows_pad, n_cols, widths, pads, sort_pad,
        extra_kw=(),
    ):
        tables = _unpack_tables(tables_flat, table_shapes)
        ep_spans = tuple(
            p * w if shape is None else p  # inlined: pad*w staged values
            for shape, w, p in zip(table_shapes, widths, pads)
        )
        er, ep = _unpack_entries(
            er_all, ep_all, row0, n_chunks, pads, ep_spans
        )
        extras = tuple(
            jax.lax.dynamic_slice(
                m, (row0,) + (0,) * (m.ndim - 1), (n_chunks,) + m.shape[1:]
            )
            for m in extra_arrays
        )
        return inner(
            tables, er, ep, *extras,
            n_chunks=n_chunks, rows_pad=rows_pad, n_cols=n_cols,
            widths=widths, pads=pads, sort_pad=sort_pad, **dict(extra_kw),
        )

    return runner


def _sort_rate_ns(L: int, packed: bool) -> float:
    """Measured v5e per-element 2-D sort rates by row length, log-linear
    interpolation.  FLOOR-FREE points from benchmarks/micro.jsonl bench
    "sort_rate27" (2^27 elems, ~24 ms dispatch floor subtracted — the
    earlier "sort2d" 2^25 points carried 0.72 ns/elem of pure floor and
    overstated short-L sorts ~5x, making the planner pick far too few
    chunks for many-row inputs)."""
    import math

    pts = [(7, 0.05), (9, 0.11), (11, 0.22), (13, 0.36), (16, 0.67),
           (25, 1.43)]
    x = math.log2(max(L, 2))
    if x <= pts[0][0]:
        r = pts[0][1]
    elif x >= pts[-1][0]:
        r = pts[-1][1]
    else:
        for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
            if x0 <= x <= x1:
                r = y0 + (y1 - y0) * (x - x0) / (x1 - x0)
                break
    return r * (1.0 if packed else 1.37)  # 2-key penalty (3.25/2.15 ≈ 1.5 at
    # long L, 1.9/1.38 ≈ 1.37 in the batched regime)


def _gather_rate_ns(w: int) -> float:
    """Expansion (class-table row-gather) cost per gathered SLOT by table
    width: each gathered row costs roughly one fixed-width memory
    transaction (narrow trailing dims tile-pad to 128 lanes), so the
    per-slot rate falls ~1/w.  Anchors: w=1 isolated gather 8.8 ns/elem
    (benchmarks/micro.jsonl "gather_width"); the fused hypersparse-5m-d2
    expansion mix {1,2,3,4,5,14} averaged 2.7 ns/slot
    (results.jsonl "batched-decompose").  Classes of width ≤ 2 are INLINED
    at staging (no gather at all) — callers pass the merged group width."""
    if w <= 2:
        return 0.05  # inlined: a reshape + where, no gather
    return 8.5 / w + 0.3


# Per-GROUP constant for the DP merge (ns per bin): every stream-concat
# piece costs ~70 ns per bin row regardless of width (2.3 ms/piece at
# k=32768 — lane-misaligned per-row copies, decomp2 "hypersparse-5m-auto"
# rows 2026-08-20).  Priced LOW deliberately: it should take free merges
# (mid-64k dropped a zero-slot-cost piece) without forcing slot-inflating
# ones (GROUP_NS=70 merged hypersparse 4->5-width at +12% slots and
# measured 0.087 vs 0.074 — results.jsonl variant="piece-cost").
DP_GROUP_NS = 5.0


def _batched_deal_plan(
    a: BCSR,
    b: BCSR,
    rf: np.ndarray,
    cap: int,
    deal_k: int | None,
    key_cols: int,
    merge_widths: tuple[int, ...] | None = None,
    discount_sorts: bool = True,
):
    """Plan the batched 2-D engine: pick the bin count k by the measured
    sort-rate model, snake-deal rows in dominant-class order, and DP-merge
    width classes so per-bin class pads stop inflating at high k.

    Works entirely from B's row widths — the ELL tables are built ONCE at
    the end with the merged class widths (building fine tables first and
    rebuilding merged ones measured 4.3 s of a 14 s plan at n=5M).

    Returns ``None`` when the input is degenerate (no flops), else
    ``(ell, rows_pc, pos_pc, assign, k, pads, slots, rows_pad)``.
    """
    from .spgemm import packable

    n = a.n_rows
    w = np.diff(b.indptr).astype(np.int64)
    nz = w > 0
    if not nz.any() or a.nnz == 0:
        return None
    # fine eighth-octave width classes (≡ EllB.build's bucketing), no tables
    wb = np.zeros(b.n_rows, np.int64)
    wn = w[nz]
    p2 = np.left_shift(1, np.frexp(wn.astype(np.float64) * 2 - 1)[1] - 1)
    step = np.maximum(p2 // 8, 1)
    wb[nz] = ((wn + step - 1) // step) * step
    classes = np.unique(wb[nz])
    C = len(classes)
    cls_of_row = np.full(b.n_rows, -1, np.int32)
    cls_of_row[nz] = np.searchsorted(classes, wb[nz]).astype(np.int32)
    # per-fine-class B-row counts -> prefix: lets the DP price a candidate
    # group at the INLINED rate when it will trip the big-table rule
    # (INLINE_TABLE_ROWS), keeping the model and the inline decision on one
    # predicate (a slot-priced gather for a to-be-inlined class biased the
    # merge toward folding it into a gathered group — the measured
    # regression in _expand_class docs, variant="no-w4-class")
    cls_rows_pref = np.zeros(C + 1, np.int64)
    np.cumsum(np.bincount(cls_of_row[nz], minlength=C), out=cls_rows_pref[1:])

    ecls = cls_of_row[a.indices]
    live = ecls >= 0
    rr = np.repeat(
        np.arange(n, dtype=np.int32), np.diff(a.indptr).astype(np.int64)
    )
    ew_full = np.where(live, classes[np.clip(ecls, 0, None)], 0)
    cum = np.zeros(a.nnz + 1, np.int64)
    np.cumsum(ew_full, out=cum[1:])
    rfp = cum[a.indptr[1:]] - cum[a.indptr[:-1]]
    if not int(rfp.sum()):
        return None
    if not live.all():
        ecls = ecls[live]
        rr = rr[live]

    # dominant class per row = class of its widest entry (groups rows with
    # similar class profiles into adjacent snake lanes, evening per-bin
    # per-class counts: ~4% fewer padded slots than the plain -rfp snake)
    dom = np.zeros(n, np.int64)
    nonempty = np.diff(a.indptr) > 0
    if nonempty.any():
        starts = a.indptr[:-1][nonempty]
        maxw = np.maximum.reduceat(ew_full, starts.astype(np.int64))
        dom[nonempty] = np.searchsorted(classes, maxw)
    # one argsort on a composite key ≡ lexsort((-rfp, dom)) at half the cost
    # (rfp < 2^48 always: it is bounded by the int32 slot domain)
    order = np.argsort((dom << 48) - rfp, kind="stable")

    def snake(k):
        pos = np.arange(n, dtype=np.int64)
        if k & (k - 1) == 0:  # power of two: bit ops beat div/mod 3x
            lane = (pos & (k - 1)).astype(np.int32)
            fwd = (pos >> k.bit_length() - 1) & 1 == 0
        else:
            lane = (pos % k).astype(np.int32)
            fwd = (pos // k) % 2 == 0
        asg = np.empty(n, np.int32)
        asg[order] = np.where(fwd, lane, k - 1 - lane)
        return asg

    # Per-slot weight for the DP: expansion gather rate by group width plus
    # a typical per-slot sort cost (2 sorts x ~0.5 ns at the L this engine
    # lands on).  Makes the merge trade padding (wider groups) against the
    # narrow-gather penalty — pure slot-minimising merges kept w∈{1,2,3}
    # groups whose gathers dominated the hypersparse kernel (96 of 124 ms).
    SORT_W = 1.0

    def dp_merge(cnt_pref, k):
        """Optimal contiguous class grouping: min Σ slots × per-slot cost."""
        best = [float("inf")] * (C + 1)
        best[0] = 0.0
        choice = [0] * (C + 1)
        for i in range(1, C + 1):
            w = int(classes[i - 1])
            # NOTE: the MERGE keeps the slot-priced gather rate even for
            # classes the inline rule will divert — pricing them at the
            # inlined 0.05 here changed hypersparse's merge {1,2,4,5,14}
            # -> {1,2,3,5,14} and measured 0.0518 -> 0.0636 (variants
            # "dp-inline-rate"/"group70-inline-rate"); only the K RANKING
            # (groups_stats below) is inline-aware, which is what moved
            # large-1m-d8 to k=32768.
            weight = _gather_rate_ns(w) + SORT_W
            for j in range(i):
                gmax = int((cnt_pref[i] - cnt_pref[j]).max())
                cost = (
                    best[j]
                    + pad_bucket(max(gmax, 8), div=32) * w * weight
                    + DP_GROUP_NS
                )
                if cost < best[i]:
                    best[i] = cost
                    choice[i] = j
        groups = []
        i = C
        while i:
            groups.append((choice[i], i))
            i = choice[i]
        groups.reverse()
        return groups

    def forced_groups(gw):
        """Contiguous class grouping at caller-forced width levels."""
        gw = sorted(int(x) for x in gw)
        if gw[-1] < int(classes[-1]):
            raise ValueError(
                f"merge_widths {gw} do not cover max class {classes[-1]}"
            )
        groups, j = [], 0
        for lvl in gw:
            i = int(np.searchsorted(classes, lvl, side="right"))
            if i > j:
                groups.append((j, i))
                j = i
        return groups

    def groups_stats(cnt_pref, groups):
        """(padded slots, gather ns/chunk) for a grouping.

        The k-RANKING prices gathered classes at the measured IN-KERNEL
        fused rate (~3.2/w + 0.05 ns/slot — the 256k profile clocks the
        w~16 expansion at 0.22 ns/slot; micro "decomp2"), not the isolated
        microbench curve `_gather_rate_ns` the DP merge keeps (its relative
        weights were validated against measured groupings; see the dp_merge
        NOTE).  The old 4x-overpriced gathered term made non-inlined
        configs (cage: 128k-row tables, under the inline threshold) refuse
        high-k plans whose shorter sorts measured 8% faster end-to-end
        (ab="pow2cliff" k=16384 vs 4096, 2026-08-20).  The masked/fused
        family (``discount_sorts=False``) keeps the old curve — its
        measured low-k optima were calibrated against it."""
        slots, gather = 0, 0.0
        for j, i in groups:
            w = int(classes[i - 1])
            s = pad_bucket(
                max(int((cnt_pref[i] - cnt_pref[j]).max()), 8), div=32
            ) * w
            slots += s
            rows_g = int(cls_rows_pref[i] - cls_rows_pref[j])
            inl = w <= INLINE_TABLE_W_MAX and rows_g > INLINE_TABLE_ROWS
            if inl:
                rate = 0.05
            elif discount_sorts:
                rate = 3.2 / w + 0.05  # measured fused rate (plain family)
            else:
                rate = _gather_rate_ns(w)
            gather += s * rate
        return slots, gather

    if deal_k:
        ks = [int(deal_k)]
    else:
        # candidates around the smallest packable bin count: larger k keeps
        # shortening the sorts (log² row length) until per-bin class padding
        # wins; smaller (2-key) k occasionally wins when padding dominates
        k_pack = 1 << max(int(n / max(cap, 1) - 1e-9).bit_length(), 6)
        # The window must reach well past k_pack: at mid-256k cap is large
        # (2048 rows/bin already packable) so k_pack is only 128, but the
        # measured kgrid optimum sits at k=32768 = 256·k_pack (8 rows/bin —
        # shorter sorts beat the extra class padding; results.jsonl
        # ab="kgrid" 2026-08-20).  The 16·k_pack ceiling of round 2 never
        # even evaluated it.  eval_k is one bincount over the entries, so
        # the wider grid costs milliseconds host-side.
        ks = sorted(
            {
                min(max(k, 64), 1 << 17)
                for k in (
                    k_pack // 4, k_pack // 2, k_pack,
                    2 * k_pack, 4 * k_pack, 8 * k_pack, 16 * k_pack,
                    32 * k_pack, 64 * k_pack, 128 * k_pack, 256 * k_pack,
                )
            }
        )
    ecls64 = ecls.astype(np.int64)

    def eval_k(k, sample_step=1, cliff=False):
        asg = snake(k)
        e, r = (ecls64, rr) if sample_step == 1 else (
            ecls64[::sample_step], rr[::sample_step]
        )
        cnt = np.bincount(e * k + asg[r], minlength=C * k).reshape(C, k)
        pref = np.zeros((C + 1, k), np.int64)
        np.cumsum(cnt, axis=0, out=pref[1:])
        groups = (
            forced_groups(merge_widths)
            if merge_widths is not None
            else dp_merge(pref, k)
        )
        slots, gather = groups_stats(pref, groups)
        rows_pad = pad_bucket(
            int(np.bincount(asg, minlength=k).max()) or 1, minimum=1, div=32
        )
        L = int(slots) * sample_step + rows_pad
        packed = packable(rows_pad, key_cols)
        # BIN_NS: fixed per-bin device cost (separator slots, per-bin
        # bookkeeping, short-row sort overheads the L-rate misses).
        # Calibrated 2026-08-20 against measured post-inline optima:
        # without it the inline-rate DP sent hypersparse to k=131072
        # (0.0567 measured vs 0.0518 at the k=32768 argmin); 100 ns/bin
        # restores hypersparse's argmin while keeping large-1m-d8's
        # measured-best k=32768 (0.1198) and leaving 64k/256k unchanged.
        BIN_NS = 100.0
        # Pallas-bitonic discount: when the executor's near-pow2 rule will
        # round this plan's sort_pad to a bitonic-eligible power of two,
        # the 2-D sorts run ~0.75x XLA's rate in-kernel (mid-64k k=8192:
        # 0.245 vs 0.34 ns/elem profiled, wall 0.0495 vs 0.0507 at the
        # model's old k=4096 pick — same-process A/B 2026-08-20).
        # Masked executors plan WITHOUT the discount: the family kernels
        # sort [k, sort_pad + pair_pad] streams (never pow2-eligible), and
        # the discounted higher-k plans measured ~10% slower for them at
        # both 64k and 256k (ab="ops-256k"/"ops-64k" variant="ab-k*",
        # same-window 2026-08-20) while plain run() wins ~10-15%.
        from .bitonic import eligible as _bitonic_ok

        Lp = pad_bucket(max(L, 8), div=32)
        p2 = 1 << (Lp - 1).bit_length()
        if (
            discount_sorts
            and packed
            and p2 <= 1.06 * Lp
            and _bitonic_ok(k, p2)
        ):
            sort_cost = 2.0 * 0.75 * _sort_rate_ns(p2, packed) * p2
        elif cliff:
            # pow2-cliff pricing (round-4 measurement, micro.jsonl
            # "sort_rate_table" + ab="pow2cliff"): XLA's 2-D sort at
            # non-pow2 L costs close to rate(next_pow2)·L, NOT the smooth
            # interp — [32768, 1088] measured 0.190 ns/elem vs 0.100 at
            # [32768, 1024].  Pricing the rate at the pow2 ceiling makes
            # plans that land just UNDER a power of two (L=992 vs 1088)
            # win, which measured -13% e2e at hypersparse (k=32768 ->
            # 45056: 0.0581 -> 0.0506, device -24%).
            sort_cost = 2.0 * _sort_rate_ns(p2, packed) * L
        else:
            sort_cost = 2.0 * _sort_rate_ns(L, packed) * L
        cost = (sort_cost + gather * sample_step + BIN_NS) * k
        return cost, k, asg, groups, rows_pad, pref

    if len(ks) == 1:
        plans = [eval_k(ks[0])]
        model_ranking = [(plans[0][0], ks[0])]
    else:
        # Rank candidates at FULL resolution up to 2^24 entries: sampling
        # inflates per-bin MAXIMA (extreme values of binomial noise) more at
        # high k, which inverted the ranking on large-1m-d8 (picked k=512,
        # 0.237 s, over k=8192, 0.179 s).  Beyond that, a 1/4 sample keeps
        # the distortion below the candidate gaps.
        step = 4 if len(rr) > (1 << 24) else 1
        evals = sorted((eval_k(k, step) for k in ks), key=lambda t: t[0])
        k0 = evals[0][1]
        # Pow2-cliff refinement (round 4): the coarse grid only holds pow2
        # multiples of k_pack, but XLA's 2-D sort at non-pow2 L costs
        # ~rate(next_pow2)·L (measured: [32768, 1088] 0.190 ns/elem vs
        # [32768, 1024] 0.100 — micro.jsonl "sort_rate_table"), so the
        # best bin count usually sits at a FRACTIONAL multiple of the
        # coarse winner that lands sort_pad just under a power of two.
        # Re-rank k0·{1, 9/8, ..., 2} under cliff pricing (the coarse
        # ranking itself is untouched — its calibration against the
        # measured optima still holds).  Measured wins through this path
        # (ab="pow2cliff", 2026-08-20, bit-exact, same-window):
        # hypersparse k=32768→36864+ 0.0581→0.0506-0.053 e2e (device
        # −16..24%), large-1m k=16384→28672 device 102.6→96.8 ms.
        # The refinement is for the PLAIN family only: the masked/fused
        # kernels sort [k, sort_pad + pair_pad] streams, so "sort_pad just
        # under a pow2" does not land the REAL sort length under the
        # cliff — and their measured optima sit at LOW k (ops-256k:
        # k=8192 0.1585 vs k=32768 0.1761, round 3).  They keep the
        # coarse pick (discount_sorts=False is how they plan).
        if discount_sorts:
            gran = max(k0 // 8, 32)
            cands = sorted(
                {min(k0 + j * gran, 1 << 17) for j in range(9)}
                | {min(k0 * m // 4, 1 << 17) for m in range(9, 17)}
            )
            refined = sorted(
                (eval_k(kk, step, cliff=True) for kk in cands),
                key=lambda t: t[0],
            )
            # the tuner consumes this ranking: cliff-priced fractional
            # candidates first (their costs are mutually comparable), then
            # the coarse tail for context
            model_ranking = [(c, kk) for c, kk, *_ in refined] + [
                (c, kk) for c, kk, *_ in evals if kk not in cands
            ]
            ranked = refined[0]
            plans = [
                ranked if step == 1 else eval_k(ranked[1], cliff=True)
            ]
        else:
            model_ranking = [(c, kk) for c, kk, *_ in evals]
            ranked = evals[0]
            plans = [ranked if step == 1 else eval_k(ranked[1])]
    cost, k, assign, groups, rows_pad, pref = plans[0]

    group_widths = tuple(int(classes[i - 1]) for _, i in groups)
    ell = EllB.build(b, group_widths if len(groups) < C else None)
    rows_pc, pos_pc = _build_class_entries(a, ell)
    pads = tuple(
        pad_bucket(
            int((pref[i] - pref[j]).max()), minimum=8, div=32
        )
        for j, i in groups
    )
    assert len(pads) == len(ell.widths), (pads, ell.widths)
    slots = sum(p * wd for p, wd in zip(pads, ell.widths))
    return ell, rows_pc, pos_pc, assign, k, pads, slots, rows_pad, model_ranking


_flat_spgemm_sep = _make_flat_kernel(_ell_spgemm_sep_jit)
_flat_spgemm_sep2d = _make_flat_kernel(_ell_spgemm_sep2d_jit)
_flat_spgemm_padded2d = _make_flat_kernel(_ell_spgemm_padded2d_jit)
_flat_masked = _make_flat_kernel(_ell_masked_jit)
_flat_masked2d = _make_flat_kernel(_ell_masked2d_jit)
_flat_counts = _make_flat_kernel(_ell_counts_jit)
_flat_counts2d = _make_flat_kernel(_ell_counts2d_jit)
_flat_masked_counts = _make_flat_kernel(_ell_masked_counts_jit)
_flat_masked_counts2d = _make_flat_kernel(_ell_masked_counts2d_jit)
_flat_counts_sum = _make_flat_kernel(_ell_counts_sum_jit)
_flat_counts_sum2d = _make_flat_kernel(_ell_counts_sum2d_jit)
_flat_or = _make_flat_kernel(_ell_or_jit)
_flat_or2d = _make_flat_kernel(_ell_or2d_jit)
_flat_or_masked = _make_flat_kernel(_ell_or_masked_jit)
_flat_or_masked2d = _make_flat_kernel(_ell_or_masked2d_jit)


class EllSpGEMMExecutor:
    """Pre-staged repeated C = A·B via the sliced-ELL engine.

    Builds the ELL layout of B, the flop-balanced row-chunk plan, and the
    per-(chunk, class) A-entry partition once (host); each :meth:`run` is one
    jitted device program returning stacked per-chunk
    ``(c_indptr, c_indices, nnz)`` — the same contract as ``SpGEMMExecutor``.

    Row chunking serves two measured purposes: chunk-local row ids pack
    ``(row << shift) | col`` into one positive int32 (single-key sorts), and
    unrolled chunks overlap (chunk k+1's gathers run under chunk k's sorts).
    ``row_chunks="auto"`` targets ~32 flop-balanced chunks, capped for
    packability while that doesn't explode the chunk count.
    """

    def __init__(
        self,
        a: BCSR,
        b: BCSR,
        *,
        row_chunks: int | str = "auto",
        masked: bool = False,
        deal_k: int | None = None,
        batched: bool = False,
        merge_widths: tuple[int, ...] | None = None,
        batched_slots_cap: int | None = None,
    ):
        if a.n_cols != b.n_rows:
            raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
        from .spgemm import require_int32_operands

        require_int32_operands(a, b)
        self.shape = (a.n_rows, b.n_cols)
        self.n_rows, self.n_cols = a.n_rows, b.n_cols
        rf = row_flops(a, b)
        # Chunk rows so the packed sort key fits one positive int32.  A
        # mask-serving executor packs (row, col, tag) — one extra low bit
        # (sort_compress_masked) — so ``masked=True`` halves the cap to keep
        # run_masked's sorts single-key packed as well.
        shift = int(self.n_cols).bit_length() + (1 if masked else 0)
        cap = 1 << max(0, 30 - shift)
        n = self.n_rows
        key_cols = 2 * self.n_cols + 1 if masked else self.n_cols
        self.batched = bool(batched)
        dealt = None
        if batched:
            # batched 2-D engine: model-chosen bin count, dominant-class
            # snake deal, DP width-class merge (builds the ELL tables once,
            # with the merged widths)
            planned = _batched_deal_plan(
                a, b, rf, cap, deal_k, key_cols, merge_widths=merge_widths,
                discount_sorts=not masked,
            )
            if planned is None:
                self.batched = False  # degenerate input: unrolled is fine
            else:
                (ell, rows_pc, pos_pc, assign, k_d, pads_d, slots_d,
                 rows_pad_d, model_ranking) = planned
                if slots_d > np.iinfo(np.int32).max:
                    raise OverflowError(
                        f"batched ELL expansion {slots_d} slots/bin "
                        "exceeds int32"
                    )
                dealt = (assign, k_d, pads_d, slots_d, rows_pad_d)
                self.widths = tuple(ell.widths)
                # model-cost-ordered (cost, k) candidates — consumed by
                # tuned_executor's empirical refinement
                self.k_ranking = list(model_ranking)
        if dealt is None:
            ell = EllB.build(b)
            rows_pc, pos_pc = _build_class_entries(a, ell)
            self.widths = tuple(ell.widths)
        # Balance chunks on PADDED expansion slots, not raw flops: per-class
        # pads are max-over-chunks, so skewed class mixes (power-law graphs)
        # inflate sort_pad when chunks are merely flop-balanced.  Per-row
        # padded weight = Σ over entries of the B-row's bucketed class width.
        padded_w = np.zeros(len(ell.widths) + 1, np.int64)
        for ci, wc in enumerate(ell.widths):
            padded_w[ci] = wc
        rfp = np.zeros(a.n_rows, np.int64)
        if a.nnz:
            entry_w = padded_w[ell.class_of_row[a.indices]]
            cum = np.zeros(a.nnz + 1, np.int64)
            np.cumsum(entry_w, out=cum[1:])
            rfp = cum[a.indptr[1:]] - cum[a.indptr[:-1]]
        total_flops = int(rfp.sum())

        def plan(bounds):
            """Evaluate a chunk plan: per-class cuts/pads and total padded
            slots (per-class pads are max-over-chunks, so skewed class mixes
            can inflate badly — the caller compares plans on this)."""
            k = len(bounds) - 1
            cuts_pc, pads = [], []
            for rcls in rows_pc:
                cuts = np.searchsorted(rcls, np.asarray(bounds))
                cuts_pc.append(cuts)
                pads.append(
                    pad_bucket(max(int(np.diff(cuts).max()), 1), minimum=8)
                )
            slots = sum(p * w for p, w in zip(pads, self.widths))
            return cuts_pc, tuple(pads), slots, slots * k

        force = row_chunks if isinstance(row_chunks, str) else None
        if force in ("auto", "contig", "deal"):
            # ~32 slot-balanced chunks: measured 0.0753 s (9 chunks) →
            # 0.0715 (19) → 0.0700 (37) on the headline config — smaller
            # sorts + deeper cross-chunk overlap, flattening past ~32.
            # The row cap keeps the packed single-key sort when n_cols
            # allows, but cap-driven plans can both explode the chunk count
            # (compile size is linear in chunks; n=1M would need 2048) and,
            # on skewed inputs, blow up the max-over-chunks class pads —
            # so the capped plan is EVALUATED and kept only if its padded
            # total stays near the uncapped plan's (n=256K: 128 packed
            # chunks measured 0.206 s vs 0.361 s unpacked; R-MAT s18: the
            # capped plan padded 5.4× and OOMed).
            budget = max(total_flops // 32, 1 << 19)
            bounds = _chunk_bounds(rfp, budget, max(n, 1))
            if cap >= 512 and -(-n // cap) <= 160:
                capped = _chunk_bounds(rfp, budget, cap)
                if len(capped) > len(bounds):
                    _, _, _, tot_c = plan(capped)
                    _, _, _, tot_u = plan(bounds)
                    if tot_c <= 2 * tot_u:
                        bounds = capped
        elif row_chunks == 1:
            bounds = [0, n]
        else:
            budget = max(total_flops // int(row_chunks), 1)
            bounds = _chunk_bounds(rfp, budget, -(-n // int(row_chunks)))
        chunks_c = list(zip(bounds, bounds[1:]))
        rows_pad_c = pad_bucket(
            max(r1 - r0 for r0, r1 in chunks_c) if n else 1, minimum=1
        )
        cuts_pc, pads_c, slots_c, _ = plan(bounds)

        # Dealt (non-contiguous) plan: rows snake-dealt into k equal bins by
        # descending padded weight.  Contiguous flop-balanced splits are the
        # reference's static schedule (final/SpGEMM_mpi_omp.c:95-108) and its
        # known weakness on power-law inputs (the schedule(dynamic) experiment,
        # old/SpGEMM_omp.c:264); dealing balances every width class's
        # per-chunk counts at once, shrinking the max-over-chunks class pads
        # (R-MAT s18: 1.38G → 1.21G padded slots) AND equalising bin sizes so
        # chunk-local row ids fit the packed sort key (rows_pad 45056 → 4096).
        from .spgemm import packable

        if dealt is None and (
            force in ("auto", "deal") or deal_k
        ) and n > 0 and self.widths and total_flops:
            if deal_k:
                k_d = int(deal_k)
            else:
                m_pack = -(-n // cap) if cap >= 512 else 257
                # 2x the packability minimum: halving sort_pad buys more at
                # the measured flat-sort rates than the finer bins' extra
                # max-over-bins padding costs — rmat-s18 same-window probe
                # (ab="rmat-k256", 2026-08-21, bit-exact): k=128 2.098 s /
                # 1.141G slots vs k=256 2.037 s / 1.275G (−2.9%); k=512
                # RESOURCE_EXHAUSTED (padding inflation outruns HBM).
                k_d = (
                    max(32, min(2 * m_pack, 256)) if m_pack <= 256 else 48
                )
            order = np.argsort(-rfp, kind="stable")
            pos = np.arange(n)
            lane = (pos % k_d).astype(np.int32)
            assign = np.empty(n, np.int32)
            assign[order] = np.where((pos // k_d) % 2 == 0, lane, k_d - 1 - lane)

            def eval_assign(asg):
                pads = tuple(
                    pad_bucket(
                        int(np.bincount(asg[rcls], minlength=k_d).max())
                        if len(rcls)
                        else 1,
                        minimum=8,
                    )
                    for rcls in rows_pc
                )
                slots = sum(p * w for p, w in zip(pads, self.widths))
                rp = pad_bucket(
                    int(np.bincount(asg, minlength=k_d).max()) or 1, minimum=1
                )
                return pads, slots, rp

            pads_d, slots_d, rows_pad_d = eval_assign(assign)
            # NOTE: a class-profile-aware greedy deal (vector bin-packing of
            # heavy rows + dominant-class round-robin tail) was built and
            # measured: it cuts padded slots 1136M → 1088M on R-MAT s18 but
            # runs 2.49 s vs the snake's 2.29 s — the changed entry order
            # costs the expansion gathers more than the slots save.  Keep
            # the snake (ROADMAP item 1 records the exploration).
            if slots_d <= np.iinfo(np.int32).max:
                dealt = (assign, k_d, pads_d, slots_d, rows_pad_d)

        def sort_cost(slots, k, rows_pad):
            # measured v5e sort rates: packed 1-key 2.71 ns/slot vs 2-key
            # 3.69 (benchmarks/micro.jsonl) → 1.36x weight when unpacked
            rate = 1.0 if packable(rows_pad, key_cols) else 1.36
            return pad_bucket(max(slots, 8)) * k * rate

        use_dealt = (
            self.batched or force == "deal" or deal_k is not None
        ) and dealt is not None
        if (
            force == "auto" and deal_k is None and not self.batched
        ) and dealt is not None:
            assign, k_d, pads_d, slots_d, rows_pad_d = dealt
            use_dealt = sort_cost(slots_d, k_d, rows_pad_d) < 0.9 * sort_cost(
                slots_c, len(chunks_c), rows_pad_c
            )

        if use_dealt:
            assign, k, self.pads, slots, self.rows_pad = dealt
            self.chunks = None
            self.bounds = None
            order2 = np.argsort(assign, kind="stable")  # chunk-grouped,
            binsz = np.bincount(assign, minlength=k)  # ascending row within
            starts = np.concatenate([[0], np.cumsum(binsz)])
            self.row_sets = [
                order2[starts[i] : starts[i + 1]] for i in range(k)
            ]
            self._assign = assign  # bin of each row — vectorised budgeting
            local_id = np.empty(n, np.int32)
            local_id[order2] = (
                np.arange(n) - np.repeat(starts[:-1], binsz)
            ).astype(np.int32)
            max_chunk_flops = (
                int(np.bincount(assign, weights=rf, minlength=k).max())
                if a.nnz
                else 0
            )
        else:
            self.bounds = np.asarray(bounds, np.int64)
            self.chunks = chunks_c
            self.row_sets = None
            self.rows_pad = rows_pad_c
            self.pads = pads_c
            slots = slots_c
            k = len(chunks_c)
            max_chunk_flops = max(
                (int(rf[r0:r1].sum()) for r0, r1 in chunks_c), default=0
            )
        self.n_chunks = k
        if slots > np.iinfo(np.int32).max:
            raise OverflowError(
                f"ELL chunk expansion {slots} slots exceeds int32; "
                "use the chunked ESC engine for this product"
            )
        # + rows_pad separator slots per chunk (sort_compress_seps); final
        # bucket at 32nd-octave.  NOT exact/lane-aligned: XLA's sort runs
        # measurably faster at octave-fraction lengths (R-MAT s18: 2.19 s at
        # the 32nd-octave 8912896 vs 2.29 s at the exact 8871936), so the
        # ≤3% slot waste buys more than it costs.
        self.sort_pad = pad_bucket(max(slots + self.rows_pad, 8), div=32)
        if self.batched:
            # Round a NEAR-pow2 batched sort_pad up to the power of two so
            # the Pallas bitonic row sort (ops/bitonic.py) can take both
            # 2-D sorts: worth it only when the slot inflation is small
            # (<=6%) and the length is inside the kernel's measured window.
            # Plans far from a power of two (hypersparse 1088, 1m-d8 11776)
            # keep the 32nd-octave bucket — the inflation would cost more
            # in gather/sort volume than the kernel saves (~4% e2e).
            from .bitonic import eligible as _bitonic_ok

            p2 = 1 << (self.sort_pad - 1).bit_length()
            if p2 <= 1.06 * self.sort_pad and _bitonic_ok(k, p2):
                self.sort_pad = p2
        self.total_slots = self.sort_pad * k
        if (
            self.batched
            and batched_slots_cap is not None
            and self.total_slots > batched_slots_cap
        ):
            # skew guard raised BEFORE staging: the batched build's host
            # staging + 3 device uploads are seconds on R-MAT-class plans,
            # all wasted when _auto_ell would discard the executor anyway
            raise OverflowError(
                f"batched stream {self.total_slots} slots exceeds the "
                f"auto-route cap {batched_slots_cap}"
            )
        # Valid output entries per chunk never exceed its true flop count
        # (+ separators), so the stacked per-chunk index outputs are
        # truncated to this bound (resident memory ∝ out_pad·k, not
        # sort_pad·k).
        self.out_pad = min(
            pad_bucket(max_chunk_flops + self.rows_pad), self.sort_pad
        )
        self.resident_slots = self.out_pad * k
        # Super-chunking: chunks are dispatched in uniform groups of
        # ``group_size`` so one compile serves every dispatch and per-dispatch
        # live memory stays bounded; the last group is padded with all-sentinel
        # dummy chunks (assemble() walks only the real ones).
        self.group_size = max(min(k, DISPATCH_SLOT_BUDGET // self.sort_pad), 1)
        # Small batched plans split into ~SMALL_PLAN_GROUPS async-queued
        # dispatches even though one fits the budget: the dispatches queue
        # without host syncs and the scheduler pipelines group i+1's stream
        # assembly under group i's sorts — the cross-dispatch overlap the
        # single big program only partially finds at this scale.  Measured
        # same-window at mid-64k-d16 (ab="group-overlap", 2026-08-21, all
        # bit-exact): device 24.3 ms (1 group) -> 22.0/21.8/21.3 ms at
        # 2/4/8 groups, e2e 0.0502 -> 0.0472 — closing VERDICT r04 ask #6
        # (the ≤22 ms two-sort bar).  Gated to plans ≤ SMALL_PLAN_SLOTS so
        # the big configs (mid-256k/1m, which already hide assembly behind
        # their longer in-program sort chains) keep their verified
        # single-dispatch shapes.
        if (
            self.batched
            and self.total_slots <= SMALL_PLAN_SLOTS
            and self.group_size >= SMALL_PLAN_GROUPS
        ):
            self.group_size = min(
                self.group_size, -(-k // SMALL_PLAN_GROUPS)
            )
        self.n_groups = -(-k // self.group_size)

        # FLAT staging: every host→device transfer through this
        # environment's tunnel costs ~13-30 ms regardless of size, so the
        # tables concatenate into ONE flat array and the per-(class, group)
        # entry arrays into ONE [k_tot, Σpads] array each — 3 uploads total
        # (~300 per-leaf puts measured 3.2 s of a 3.4 s build on rmat-s16).
        # Kernels unpack inside jit (_make_flat_kernel).
        # Narrow classes are INLINED: the staged entry "position" becomes
        # B's row values themselves (table_shapes slot None, no table
        # bytes).  Each gathered row costs ~8.5 ns on v5e regardless of
        # width (narrow trailing dims tile-pad to 128 lanes), so skipping
        # the gather for a class removes its whole expansion cost — the
        # hypersparse-5m-d2 expansion was 96 of 124 ms.  Inlining is a pure
        # operand-LAYOUT choice (like CSR vs ELL), applied only when it
        # does not grow the staged bytes: w=1 always (the value occupies
        # exactly the pointer's slot), w=2 when entries*(w-1) <= nc*w
        # (duplicating rows referenced ~<=2x costs less than keeping the
        # pointer column plus the shared table).
        # ... and classes with BIG tables inline regardless of the byte
        # rule (INLINE_TABLE_ROWS/INLINE_TABLE_W_MAX — the XLA big-table
        # gather pathology; constants' comment has the profiled cliff).
        # Folding such a class into a wider one just moves the pathology
        # to the merged table (variant="no-w4-class": 0.0843 s).
        self.inline = tuple(
            w == 1
            or (
                w <= 2
                and len(pos_pc[ci]) * (w - 1) <= ell.tables[ci].shape[0] * w
            )
            or (
                w <= INLINE_TABLE_W_MAX
                and ell.tables[ci].shape[0] > INLINE_TABLE_ROWS
            )
            for ci, w in enumerate(self.widths)
        )
        self.table_shapes = tuple(
            None if inl else t.shape
            for inl, t in zip(self.inline, ell.tables)
        )
        live_tables = [
            t for inl, t in zip(self.inline, ell.tables) if not inl
        ]
        tables_flat = (
            np.concatenate([t.reshape(-1) for t in live_tables])
            if live_tables
            else np.zeros(0, np.int32)
        )
        k_tot = self.n_groups * self.group_size
        # inlined classes stage pad*w value columns; pointer classes pad
        ep_spans = np.array(
            [
                p * w if inl else p
                for p, w, inl in zip(self.pads, self.widths, self.inline)
            ],
            np.int64,
        )
        P = sum(self.pads)
        P_ep = int(ep_spans.sum())
        offs = np.concatenate([[0], np.cumsum(self.pads)]).astype(np.int64)
        offs_ep = np.concatenate([[0], np.cumsum(ep_spans)]).astype(np.int64)
        er_all = np.full((k_tot, P), self.rows_pad, np.int32)
        ep_all = np.zeros((k_tot, P_ep), np.int32)
        if self.row_sets is not None:
            # per-class partition of A's entries by dealt chunk; within a
            # chunk entries keep ascending global-row order, so chunk-local
            # ids (local_id) match the mask staging and assembly order
            er_flat, ep_flat = er_all.reshape(-1), ep_all.reshape(-1)
            for ci, (rcls, pcls) in enumerate(zip(rows_pc, pos_pc)):
                ch = assign[rcls]
                ordc = np.argsort(ch, kind="stable")
                cnt = np.bincount(ch, minlength=k)
                cst = np.concatenate([[0], np.cumsum(cnt)])
                rs, ps = rcls[ordc], pcls[ordc]
                # vectorised bin fill (a python loop over k bins dominates
                # staging at the batched engine's k of thousands)
                rank = np.arange(len(rs), dtype=np.int64) - np.repeat(
                    cst[:-1], cnt
                )
                er_flat[
                    ch[ordc].astype(np.int64) * P + offs[ci] + rank
                ] = local_id[rs]
                base_ep = ch[ordc].astype(np.int64) * P_ep + offs_ep[ci]
                if self.inline[ci]:
                    w = self.widths[ci]
                    dst = (base_ep + rank * w)[:, None] + np.arange(w)
                    ep_flat[dst.reshape(-1)] = ell.tables[ci][ps].reshape(-1)
                else:
                    ep_flat[base_ep + rank] = ps
        else:
            for ci, (rcls, pcls) in enumerate(zip(rows_pc, pos_pc)):
                cuts = cuts_pc[ci]
                o, o_ep = offs[ci], offs_ep[ci]
                w = self.widths[ci] if self.inline[ci] else 1
                ps_all = (
                    ell.tables[ci][pcls].reshape(-1)
                    if self.inline[ci]
                    else pcls
                )
                for kk, (r0, r1) in enumerate(self.chunks):
                    lo, hi = cuts[kk], cuts[kk + 1]
                    # chunk-local row ids
                    er_all[kk, o : o + hi - lo] = rcls[lo:hi] - r0
                    ep_all[kk, o_ep : o_ep + (hi - lo) * w] = ps_all[
                        lo * w : hi * w
                    ]
        self.tables_flat, self.er_all, self.ep_all = jax.device_put(
            (tables_flat, er_all, ep_all)
        )
        # mask/operand staging cache, keyed on id() + weakref identity check
        self._mask_cache: dict = {}

    def _flat_kw(self):
        return dict(
            table_shapes=self.table_shapes, n_chunks=self.group_size,
            rows_pad=self.rows_pad, n_cols=self.n_cols,
            widths=self.widths, pads=self.pads, sort_pad=self.sort_pad,
        )

    def _row0s(self):
        for gi in range(self.n_groups):
            yield gi * self.group_size

    def run(self):
        """Stacked per-chunk (c_indices, nnz_c) device arrays — row pointers
        ride INSIDE the index stream as ``n_cols`` separators
        (``sort_compress_seps``; assemble() splits them off host-side).

        One dispatch per chunk group (all groups share one compiled program);
        group outputs are concatenated on device.  Trailing dummy-chunk rows
        (sentinel-only) may follow the real chunks — assemble() ignores them.
        """
        kernel = _flat_spgemm_sep2d if self.batched else _flat_spgemm_sep
        outs = [
            kernel(
                self.tables_flat, self.er_all, self.ep_all, row0,
                **self._flat_kw(), extra_kw=(("out_pad", self.out_pad),),
            )
            for row0 in self._row0s()
        ]
        if len(outs) == 1:
            return outs[0]
        return tuple(
            jnp.concatenate([o[i] for o in outs]) for i in range(2)
        )

    def run_padded(self):
        """ONE-SORT device step: stacked ``(keys, nnz)`` where ``keys`` is
        each chunk's sorted packed-key stream with ``int32 max`` holes
        (duplicates and out-of-chunk sentinels demoted, NOT compacted) and
        separators embedded — :meth:`assemble_padded` compacts on the host.

        Halves device time vs :meth:`run` at mid-64k (34.9 -> 17.3 ms
        measured, ab="one-sort" 2026-08-20, bit-exact) by dropping the
        compaction sort; the price is pulling the full ``[k, sort_pad]``
        stream instead of ``[k, out_pad]``.  Use on PCIe-attached hosts or
        when results feed device-resident composition; on this
        environment's ~25 MB/s result tunnel the compacted default wins
        e2e for one-shot calls above the 64k class.  Batched plans only
        (they keep keys packed by construction).
        """
        if not self.batched:
            raise ValueError("run_padded requires a batched executor")
        outs = [
            _flat_spgemm_padded2d(
                self.tables_flat, self.er_all, self.ep_all, row0,
                **self._flat_kw(),
            )
            for row0 in self._row0s()
        ]
        if len(outs) == 1:
            return outs[0]
        return tuple(
            jnp.concatenate([o[i] for o in outs]) for i in range(2)
        )

    def assemble_padded(self, outputs) -> "BCSR":
        """Host assembly of :meth:`run_padded` outputs: drop the
        ``int32 max`` holes, unpack columns, and hand the per-chunk
        separator-embedded streams to the same assembler :meth:`assemble`
        uses — bit-exact with the two-sort path by construction."""
        dem_dev, nnz_dev = outputs
        dem = np.asarray(dem_dev)
        nnz = np.asarray(nnz_dev).astype(np.int64)
        valid = nnz.copy()
        valid[self.n_chunks :] = 0
        sent = np.iinfo(np.int32).max
        shift = int(self.n_cols).bit_length()
        flat = dem[: self.n_chunks].ravel()
        keys = flat[flat != sent]
        cols = (keys & ((1 << shift) - 1)).astype(np.int32)
        bounds = np.cumsum(valid[: self.n_chunks])
        chunk_idx = (
            np.split(cols, bounds[:-1]) if self.n_chunks else []
        )
        return self._assemble_seps_batch(chunk_idx, valid)

    def staged_nnz_pad(self, mat: "BCSR") -> int:
        """Per-chunk padded nnz a staged side operand (mask / fused-OR D)
        occupies — the pad :meth:`stage_mask` will use.  Lets callers budget
        ``run_or``/``run_masked`` (whose sorts and outputs widen by this)
        BEFORE staging; computed on the raw operand it upper-bounds the
        canonicalised pad (dedup only shrinks rows)."""
        if self.row_sets is not None:
            # one bincount over the deal assignment, not a python loop per
            # bin (the batched engine deals THOUSANDS of bins — the loop
            # cost seconds per spgemm_or/run_or budget call at k=32768)
            lens_all = np.diff(mat.indptr).astype(np.float64)
            per_bin = np.bincount(
                self._assign, weights=lens_all, minlength=len(self.row_sets)
            )
            return pad_bucket(max(int(per_bin.max()), 1))
        return pad_bucket(
            max(int(mat.indptr[r1] - mat.indptr[r0]) for r0, r1 in self.chunks)
        )


    def stage_mask(self, f: "BCSR"):
        """Canonicalise, chunk-slice, and device-stage a mask (or fused-OR
        D operand) for :meth:`run_masked` / :meth:`run_or` /
        :meth:`run_counts_sum`.  Returns an opaque ``(f_ptr, f_idx)`` pair
        of full stacked device arrays; staging once and reusing it keeps
        repeated masked products free of per-call host prep (~50 ms of a
        127 ms masked multiply at n=64K).  Results are also cached on
        operand identity (weakref-validated), so graph pipelines that pass
        the same BCSR mask repeatedly stage it once."""
        from .spgemm import pad_chunk_csr

        hit = self._mask_cache.get(id(f))
        if hit is not None:
            wf, staged = hit
            if wf() is f:
                return staged
            del self._mask_cache[id(f)]
        f_in = f
        if f.shape != self.shape:
            raise ValueError(f"mask shape {f.shape} != product {self.shape}")
        f = f.sum_duplicates()
        f_nnz_pad = self.staged_nnz_pad(f)
        k_tot = self.n_groups * self.group_size
        if self.row_sets is not None:
            # one vectorised pass over all chunks (a python loop over the
            # batched engine's thousands of bins costs seconds)
            ptr_all, idx_all = _pad_rowset_csr_all(
                f, self.row_sets, self.rows_pad, f_nnz_pad, fill=self.n_cols
            )
        else:
            ptrs, idxs = [], []
            for r0, r1 in self.chunks:
                fp, fi, _ = pad_chunk_csr(
                    f, r0, r1, self.rows_pad, f_nnz_pad, fill=self.n_cols
                )
                ptrs.append(fp)
                idxs.append(fi)
            ptr_all, idx_all = np.stack(ptrs), np.stack(idxs)
        if k_tot > self.n_chunks:  # trailing dummy group-fill chunks: empty
            pad_n = k_tot - self.n_chunks
            ptr_all = np.concatenate(
                [ptr_all, np.zeros((pad_n, self.rows_pad + 1), np.int32)]
            )
            idx_all = np.concatenate(
                [idx_all, np.full((pad_n, f_nnz_pad), self.n_cols, np.int32)]
            )
        staged = jax.device_put(  # two transfers total (see staging note)
            (ptr_all, idx_all)
        )
        while len(self._mask_cache) >= 4:
            self._mask_cache.pop(next(iter(self._mask_cache)))
        self._mask_cache[id(f_in)] = (weakref.ref(f_in), staged)
        return staged

    def run_masked(self, f):
        """Masked multiply C = F .* (A·B) with this executor's staged A/B.

        ``f`` is a :class:`BCSR` mask (staged per call) or the result of
        :meth:`stage_mask` (no per-call host work).
        """
        fp_all, fi_all = f if isinstance(f, tuple) else self.stage_mask(f)
        kernel = _flat_masked2d if self.batched else _flat_masked
        outs = [
            kernel(
                self.tables_flat, self.er_all, self.ep_all, row0,
                fp_all, fi_all, **self._flat_kw(),
            )
            for row0 in self._row0s()
        ]
        if len(outs) == 1:
            return outs[0]
        return tuple(
            jnp.concatenate([o[i] for o in outs]) for i in range(2)
        )

    def run_counts(self):
        """Counting multiply C = A·B with per-entry multiplicities: stacked
        per-chunk ``(c_indptr, c_indices, c_counts, nnz)`` device arrays
        (see :func:`_ell_counts_jit`).  Assemble with
        :meth:`assemble_counts`.  Requires canonical operands — duplicate
        operand entries would inflate multiplicities (the boolean ops dedup
        for free in the sort; counts cannot)."""
        kernel = _flat_counts2d if self.batched else _flat_counts
        width = 3 if self.batched else 4  # batched: sep-embedded, no indptr
        outs = [
            kernel(
                self.tables_flat, self.er_all, self.ep_all, row0,
                **self._flat_kw(), extra_kw=(("out_pad", self.out_pad),),
            )
            for row0 in self._row0s()
        ]
        if len(outs) == 1:
            return outs[0]
        return tuple(
            jnp.concatenate([o[i] for o in outs]) for i in range(width)
        )

    def run_masked_counts(self, f):
        """Masked counting multiply C = F .* (A·B) with multiplicities
        (per-mask-entry common-neighbor counts when f = a = b).  ``f`` is a
        :class:`BCSR` mask or the result of :meth:`stage_mask`.  Build the
        executor with ``masked=True`` to keep the join sort packed."""
        fp_all, fi_all = f if isinstance(f, tuple) else self.stage_mask(f)
        kernel = _flat_masked_counts2d if self.batched else _flat_masked_counts
        width = 3 if self.batched else 4  # batched: sep-embedded, no indptr
        outs = [
            kernel(
                self.tables_flat, self.er_all, self.ep_all, row0,
                fp_all, fi_all, **self._flat_kw(),
            )
            for row0 in self._row0s()
        ]
        if len(outs) == 1:
            return outs[0]
        return tuple(
            jnp.concatenate([o[i] for o in outs]) for i in range(width)
        )

    def run_counts_sum(self, f):
        """Σ over mask entries (i, j) of the multiplicity of (A·B)[i, j] —
        ONE int32 scalar per chunk leaves the device (stacked; trailing
        dummy group-fill chunks contribute 0).  With ``f`` = A = B = a
        symmetric hollow adjacency this is 6× the triangle count."""
        fp_all, fi_all = f if isinstance(f, tuple) else self.stage_mask(f)
        kernel = _flat_counts_sum2d if self.batched else _flat_counts_sum
        outs = [
            kernel(
                self.tables_flat, self.er_all, self.ep_all, row0,
                fp_all, fi_all, **self._flat_kw(),
            )
            for row0 in self._row0s()
        ]
        if len(outs) == 1:
            return outs[0]
        return jnp.concatenate(outs)

    def assemble_counts(self, outputs) -> tuple[BCSR, np.ndarray]:
        """Host assembly of :meth:`run_counts` / :meth:`run_masked_counts`
        outputs: ``(BCSR, counts)`` with ``counts[k]`` (int64) the
        multiplicity of ``indices[k]``."""
        from .spgemm import pull_chunk_prefixes

        if len(outputs) == 3:  # batched: sep-embedded (idx, counts, nnz)
            idx_dev, cnt_dev, nnz_dev = outputs
            nnz_c = np.asarray(nnz_dev)
            valid = nnz_c.astype(np.int64)
            valid[self.n_chunks :] = 0  # trailing dummy group-fill chunks
            chunk_idx = pull_chunk_prefixes(idx_dev, valid)
            chunk_cnt = pull_chunk_prefixes(cnt_dev, valid)
            return self._assemble_seps_batch(chunk_idx, valid, chunk_cnt)
        ptr_dev, idx_dev, cnt_dev, nnz_dev = outputs
        c_ptr, nnz_c = np.asarray(ptr_dev), np.asarray(nnz_dev)
        valid = nnz_c.astype(np.int64)
        valid[self.n_chunks :] = 0  # trailing dummy group-fill chunks
        chunk_idx = pull_chunk_prefixes(idx_dev, valid)
        chunk_cnt = pull_chunk_prefixes(cnt_dev, valid)
        parts = [
            (c_ptr[i], chunk_idx[i], chunk_cnt[i], nnz_c[i])
            for i in range(self.n_chunks)
        ]
        if self.row_sets is not None:
            return _stitch_sets(self.row_sets, self.shape[0], self.shape, parts)
        indptr_parts = [np.zeros(1, np.int64)]
        index_parts, count_parts = [], []
        base = 0
        for (r0, r1), (ptr_i, idx_i, cnt_i, n_i) in zip(self.chunks, parts):
            k = int(n_i)
            index_parts.append(np.asarray(idx_i[:k]))
            count_parts.append(np.asarray(cnt_i[:k]))
            indptr_parts.append(
                np.asarray(ptr_i[1 : r1 - r0 + 1], dtype=np.int64) + base
            )
            base += k
        indptr = np.concatenate(indptr_parts)
        indices = (
            np.concatenate(index_parts)
            if index_parts
            else np.zeros(0, np.int32)
        )
        counts = (
            np.concatenate(count_parts).astype(np.int64)
            if count_parts
            else np.zeros(0, np.int64)
        )
        return BCSR(indptr, indices, self.shape), counts

    def run_or(self, d, mask=None):
        """Fused union-product C = D OR (A·B), optionally D OR (F .* (A·B)),
        with this executor's staged A/B — ≡ ``SpGEMM_dor`` /
        ``SpGEMM_dor_masked`` (old/BSpGEMM.c:75-254), served by the
        sliced-ELL engine (the reference only ever ran these serially).

        ``d`` and ``mask`` are :class:`BCSR` operands (staged per call) or
        results of :meth:`stage_mask` (no per-call host work)."""
        dp_all, di_all = d if isinstance(d, tuple) else self.stage_mask(d)
        if mask is None:
            d_pad = di_all.shape[-1]
            # D's pairs extend every chunk's sort; keep the total at a
            # 32nd-octave bucket (XLA sorts run faster there) and bound
            # the resident output by out_pad + D's width
            kw = self._flat_kw()
            kw["sort_pad"] = pad_bucket(self.sort_pad + d_pad, div=32)
            kernel = _flat_or2d if self.batched else _flat_or
            outs = [
                kernel(
                    self.tables_flat, self.er_all, self.ep_all, row0,
                    dp_all, di_all, **kw,
                    extra_kw=(
                        (
                            "out_pad",
                            min(
                                pad_bucket(self.out_pad + d_pad),
                                kw["sort_pad"],
                            ),
                        ),
                    ),
                )
                for row0 in self._row0s()
            ]
        else:
            fp_all, fi_all = (
                mask if isinstance(mask, tuple) else self.stage_mask(mask)
            )
            kw = self._flat_kw()
            if self.batched:
                # batched join keeps the run() stream (separators embedded);
                # D/mask pairs concatenate inside the compress fn
                kernel = _flat_or_masked2d
            else:
                kw["sort_pad"] = self.sort_pad - self.rows_pad
                kernel = _flat_or_masked
            outs = [
                kernel(
                    self.tables_flat, self.er_all, self.ep_all, row0,
                    dp_all, di_all, fp_all, fi_all, **kw,
                )
                for row0 in self._row0s()
            ]
        if len(outs) == 1:
            return outs[0]
        return tuple(
            jnp.concatenate([o[i] for o in outs]) for i in range(len(outs[0]))
        )

    def assemble(self, outputs) -> BCSR:
        from .spgemm import pull_chunk_prefixes, split_seps

        if len(outputs) == 2:  # separator-embedded (run): split host-side
            idx_dev, nnz_dev = outputs
            nnz_c = np.asarray(nnz_dev)
            valid = nnz_c.astype(np.int64)
            valid[self.n_chunks :] = 0  # trailing dummy group-fill chunks
            chunk_idx = pull_chunk_prefixes(idx_dev, valid)
            if self.n_chunks >= 256:
                # per-chunk python splitting/stitching costs seconds at the
                # batched engine's chunk counts — one vectorised pass instead
                return self._assemble_seps_batch(chunk_idx, valid)
            parts = [
                split_seps(
                    chunk_idx[i], int(nnz_c[i]), self.rows_pad, self.n_cols
                )
                for i in range(self.n_chunks)
            ]
            return self._assemble_parts(parts)
        ptr_dev, idx_dev, nnz_dev = outputs
        c_ptr, nnz_c = np.asarray(ptr_dev), np.asarray(nnz_dev)
        valid = nnz_c.astype(np.int64)
        valid[self.n_chunks :] = 0
        chunk_idx = pull_chunk_prefixes(idx_dev, valid)
        parts = [
            (c_ptr[i], chunk_idx[i], nnz_c[i]) for i in range(self.n_chunks)
        ]
        return self._assemble_parts(parts)

    def _assemble_seps_batch(
        self, chunk_idx, valid: np.ndarray, chunk_cnt=None
    ) -> BCSR:
        """Vectorised host assembly of separator-embedded chunk streams:
        ONE pass over the concatenation instead of per-chunk
        ``split_seps`` + stitch (which cost ~29 s at k=2048 / 67M nnz;
        this path measures sub-second there).  With ``chunk_cnt`` (the
        counting family's multiplicity payload, positionally aligned with
        the index stream) returns ``(BCSR, counts int64)`` — separator
        slots are dropped from both arrays."""
        k = self.n_chunks
        n_rows = self.shape[0]
        big = (
            np.concatenate([chunk_idx[i] for i in range(k)])
            if k
            else np.zeros(0, np.int32)
        )
        bigc = (
            np.concatenate([chunk_cnt[i] for i in range(k)])
            if chunk_cnt is not None and k
            else None
        )
        nnz_k = valid[:k]
        starts = np.cumsum(nnz_k) - nnz_k
        sep_mask = big == self.n_cols
        bpos = np.flatnonzero(sep_mask)
        if len(bpos) != k * self.rows_pad:
            raise RuntimeError(
                f"separator-count invariant violated: {len(bpos)} separators "
                f"for {k} chunks x rows_pad {self.rows_pad}"
            )
        # per-chunk exclusive row pointers off the separator positions
        bpos_k = bpos.reshape(k, self.rows_pad) - starts[:, None]
        ptr_tail = bpos_k - np.arange(self.rows_pad, dtype=np.int64)[None, :]
        lens_kl = np.diff(
            np.concatenate([np.zeros((k, 1), np.int64), ptr_tail], axis=1),
            axis=1,
        )  # [k, rows_pad] per-(chunk, local-row) entry counts
        indices_all = big[~sep_mask]  # (chunk, ascending local row) order
        counts_all = bigc[~sep_mask] if bigc is not None else None
        if self.row_sets is not None:
            rows_concat = np.concatenate(self.row_sets)
            binsz = np.array([len(r) for r in self.row_sets], np.int64)
        else:
            rows_concat = np.concatenate(
                [np.arange(r0, r1, dtype=np.int64) for r0, r1 in self.chunks]
            )
            binsz = np.array([r1 - r0 for r0, r1 in self.chunks], np.int64)
        real = (
            np.arange(self.rows_pad, dtype=np.int64)[None, :] < binsz[:, None]
        )
        lens_real = lens_kl[real]  # aligned with rows_concat
        lengths = np.zeros(n_rows, np.int64)
        lengths[rows_concat] = lens_real
        indptr = np.concatenate([[0], np.cumsum(lengths)])
        total = int(indptr[-1])
        indices = np.empty(total, np.int32)
        nzm = lens_real > 0
        lr = lens_real[nzm]
        dst = np.repeat(indptr[rows_concat[nzm]], lr) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(lr) - lr, lr)
        )
        indices[dst] = indices_all
        out = BCSR(indptr, indices, self.shape)
        if counts_all is None:
            return out
        counts = np.empty(total, np.int64)
        counts[dst] = counts_all
        return out, counts

    def _assemble_parts(self, parts) -> BCSR:
        if self.row_sets is not None:
            return _stitch_sets(
                self.row_sets, self.shape[0], self.shape, parts
            )
        it = iter(parts)
        return _stitch(
            self.chunks, self.shape[0], self.shape, lambda r0, r1: next(it)
        )

    def run_assemble_streaming(self) -> BCSR:
        """Compute + assemble with per-group host pull: device memory stays
        bounded by ONE dispatch group instead of the whole product.  This is
        what lets the ELL engine cover products whose total padded expansion
        exceeds HBM (the resident :meth:`run` would OOM) — the TPU analogue of
        the reference's grow-as-you-go realloc for huge outputs
        (final/SpGEMM_mpi_omp.c:28-31), restructured as bounded-footprint
        dispatches."""
        from .spgemm import pull_chunk_prefixes, split_seps

        host_parts = []
        kernel = _flat_spgemm_sep2d if self.batched else _flat_spgemm_sep
        for row0 in self._row0s():
            idx_dev, nnz_dev = kernel(
                self.tables_flat, self.er_all, self.ep_all, row0,
                **self._flat_kw(), extra_kw=(("out_pad", self.out_pad),),
            )
            nnz = np.asarray(nnz_dev)
            # pull only the valid prefixes: compact the group on device when
            # profitable (ONE kernel shape shared by every group)
            group_idx = pull_chunk_prefixes(idx_dev, nnz.astype(np.int64))
            for j in range(nnz.shape[0]):
                host_parts.append(
                    split_seps(
                        group_idx[j], int(nnz[j]),
                        self.rows_pad, self.n_cols,
                    )
                )
        return self._assemble_parts(host_parts[: self.n_chunks])


def _pad_rowset_csr(
    mat: BCSR, rows: np.ndarray, rows_pad: int, nnz_pad: int, fill: int = 0
) -> tuple[np.ndarray, np.ndarray, int]:
    """``pad_chunk_csr`` for a non-contiguous (dealt) row set: local CSR of
    ``mat``'s rows in the given order, uniformly padded."""
    lens = (mat.indptr[rows + 1] - mat.indptr[rows]).astype(np.int64)
    total = int(lens.sum())
    ptr = np.full(rows_pad + 1, total, np.int32)
    ptr[0] = 0
    ptr[1 : len(rows) + 1] = np.cumsum(lens)
    idx = np.full(nnz_pad, fill, np.int32)
    if total:
        nz = lens > 0
        src = _segment_sources(mat.indptr, rows[nz], lens[nz])
        idx[:total] = mat.indices[src]
    return ptr, idx, total


def _pad_rowset_csr_all(
    mat: BCSR, row_sets, rows_pad: int, nnz_pad: int, fill: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """All chunks' :func:`_pad_rowset_csr` in ONE vectorised pass:
    ``(ptr [k, rows_pad+1], idx [k, nnz_pad])`` stacked.  A python loop over
    the batched engine's thousands of dealt bins costs seconds of staging;
    this is a handful of numpy passes over the concatenated row sets."""
    k = len(row_sets)
    rows_concat = (
        np.concatenate(row_sets) if k else np.zeros(0, np.int64)
    ).astype(np.int64)
    binsz = np.array([len(r) for r in row_sets], np.int64)
    lens = (mat.indptr[rows_concat + 1] - mat.indptr[rows_concat]).astype(
        np.int64
    )
    cum = np.cumsum(lens)
    cum0 = np.concatenate([[0], cum])
    starts_chunk = np.cumsum(binsz) - binsz  # first row slot per chunk
    chunk_of = np.repeat(np.arange(k, dtype=np.int64), binsz)
    base = cum0[starts_chunk]  # entries before each chunk
    totals = cum0[starts_chunk + binsz] - base
    local_end = cum - np.repeat(base, binsz)  # inclusive cumsum within chunk
    ptr = np.empty((k, rows_pad + 1), np.int32)
    ptr[:] = totals[:, None].astype(np.int32)
    ptr[:, 0] = 0
    within = np.arange(len(rows_concat), dtype=np.int64) - np.repeat(
        starts_chunk, binsz
    )
    ptr[chunk_of, within + 1] = local_end.astype(np.int32)
    idx = np.full((k, nnz_pad), fill, np.int32)
    nz = lens > 0
    if nz.any():
        src = _segment_sources(mat.indptr, rows_concat[nz], lens[nz])
        lr = lens[nz]
        row_off = (chunk_of[nz] * nnz_pad + local_end[nz] - lr)
        dst = np.repeat(row_off, lr) + (
            np.arange(int(lr.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(lr) - lr, lr)
        )
        idx.reshape(-1)[dst] = mat.indices[src]
    return ptr, idx


def _stitch_sets(row_sets, n_rows: int, shape, parts):
    """Host assembly for the dealt plan: scatter each chunk's row segments
    back to their global rows (the non-contiguous analogue of ``_stitch``'s
    memcpy+prefix-fix, final/SpGEMM_mpi_omp.c:117-141).  ``parts`` is one
    ``(c_ptr, c_idx, nnz_c)`` triple per chunk — or, for the counting
    engine, ``(c_ptr, c_idx, c_cnt, nnz_c)``, whose counts payload scatters
    to the same segment targets and is returned as a second (int64) array.
    Chunk-local row ids were assigned in ascending global-row order, so each
    chunk's compacted index stream is already segment-ordered."""
    has_payload = bool(parts) and len(parts[0]) == 4
    lengths = np.zeros(n_rows, np.int64)
    for rows, part in zip(row_sets, parts):
        if len(rows):
            cp = np.asarray(part[0][: len(rows) + 1], dtype=np.int64)
            lengths[rows] = np.diff(cp)
    indptr = np.concatenate([[0], np.cumsum(lengths)])
    total = int(indptr[-1])
    # int64 scatter targets; BCSR demotes the pointers to int32 when they fit
    indices = np.empty(total, np.int32)
    payload = np.empty(total, np.int64) if has_payload else None
    for rows, part in zip(row_sets, parts):
        c_idx = part[1]
        nnz_c = int(part[-1])
        if not nnz_c:
            continue
        lens = lengths[rows]
        nz = lens > 0
        lens = lens[nz]
        dst = np.repeat(indptr[rows[nz]], lens) + (
            np.arange(nnz_c, dtype=np.int64)
            - np.repeat(np.cumsum(lens) - lens, lens)
        )
        indices[dst] = np.asarray(c_idx[:nnz_c])
        if has_payload:
            payload[dst] = np.asarray(part[2][:nnz_c])
    out = BCSR(indptr, indices, shape)
    return (out, payload) if has_payload else out


def _chunk_bounds(rf: np.ndarray, budget: int, max_rows: int) -> list[int]:
    """Contiguous flop-balanced row boundaries with a hard per-chunk row cap."""
    from .spgemm import _chunk_rows

    chunks = _chunk_rows(rf, budget, max_rows)
    return [c[0] for c in chunks] + [chunks[-1][1]]


def ell_spgemm(a: BCSR, b: BCSR) -> BCSR:
    """One-shot C = A·B via the sliced-ELL engine (bit-exact with ESC)."""
    ex = EllSpGEMMExecutor(a, b)
    return ex.assemble(ex.run())


# Per-dispatch expansion-slot budget: sorts carry ~24 B of live intermediates
# per slot, so 2^27 slots ≈ 3 GB per dispatch — comfortable on a 16 GB chip
# while keeping compile sizes sane.  Larger products run as multiple uniform
# dispatches sharing one compile (see EllSpGEMMExecutor._row0s).
DISPATCH_SLOT_BUDGET = 1 << 27

# Batched plans deliberately split into this many async dispatch groups
# (cross-dispatch assembly/sort pipelining — see the group_size comment in
# EllSpGEMMExecutor.__init__).  Measured same-window, all bit-exact
# (ab="group-overlap" + g8/g16 probes, 2026-08-21), device ms per tier at
# 1 / 4 / 8 / 16 groups: mid-64k 24.3 / 21.8 / 21.3 / 21.9; cage-128k
# 49.4 / 43.6 / **24.5** / 27.7; mid-256k 106.0 / 98.9 / **91.3** / 93.6;
# 1m-d8 91.6 / 84.8 / **80.9**; hypersparse 17.9-24 / 12.1 / **10.5**
# (e2e 0.044-0.051 -> 0.036).  Eight is the sweet spot everywhere
# (sixteen regresses on cage and ties elsewhere); the gate covers every
# plan whose slots fit ONE dispatch budget (bigger plans already split by
# the budget itself).
SMALL_PLAN_GROUPS = 8
SMALL_PLAN_SLOTS = 1 << 27

# Resident-output budget for auto-choosing ELL over chunked ESC: all chunks'
# truncated index outputs (out_pad each) are live at once at 4 B/slot, on top
# of one dispatch's ~24 B/slot sort intermediates → 2^30 out-slots ≈ 4 GB of
# outputs + ~3 GB transient, comfortable on a 16 GB chip.
AUTO_ELL_MAX_SLOTS = 1 << 30


_EXEC_CACHE: dict = {}
_EXEC_CACHE_MAX = 4
# don't pin staging for huge operands a one-shot caller may never reuse
_EXEC_CACHE_MAX_NNZ = 64 << 20


def cached_executor(
    a: BCSR, b: BCSR, *, masked: bool = False, allow_bsr: bool = False
):
    """An :class:`EllSpGEMMExecutor` cached on operand IDENTITY.

    One-shot entry points (``spgemm``/``masked_spgemm``/``spgemm_counts``
    and the graph ops built on them) re-stage operands every call; analytics
    pipelines that hit the same matrices repeatedly (triangle count then
    clustering coefficients then k-truss on one graph) waste a full staging
    per op.  Identity keys are validated through weakrefs (guards id()
    reuse after GC); entries evict FIFO at {max} executors and oversized
    operands are never cached.

    ``allow_bsr=True`` lets block-clustered plain products route to the
    staged MXU engine (:func:`..bsr.maybe_bsr_executor` — 13x faster than
    the sort engines on the blocked canonical, results.jsonl 2026-08-21);
    only callers that need nothing beyond ``assemble(run())`` may pass it
    (the BSR executor serves no masked/or/counts methods).
    """
    key = (id(a), id(b), masked, allow_bsr)
    hit = _EXEC_CACHE.get(key)
    if hit is not None:
        wa, wb, ex = hit
        if wa() is a and wb() is b:
            return ex
        del _EXEC_CACHE[key]
    ex = None
    if allow_bsr and not masked:
        from .bsr import maybe_bsr_executor

        ex = maybe_bsr_executor(a, b)
    if ex is None:
        # many-row inputs take the batched 2-D plan exactly like
        # auto_executor — the whole op family (masked/counts/or) is served
        # by both forms, with the same skew guard (BATCHED_MAX_SLOTS ->
        # unrolled dealt)
        ex = _auto_ell(a, b, masked=masked)
    if a.nnz + b.nnz <= _EXEC_CACHE_MAX_NNZ:
        while len(_EXEC_CACHE) >= _EXEC_CACHE_MAX:
            _EXEC_CACHE.pop(next(iter(_EXEC_CACHE)))
        _EXEC_CACHE[key] = (weakref.ref(a), weakref.ref(b), ex)
    return ex


def prefer_batched(a: BCSR, b: BCSR) -> bool:
    """Should the plain product use the batched 2-D engine on this input?

    The unrolled engine's packed-key plan needs ≤ ``cap`` rows per chunk and
    tops out around 160 chunks (compile size is linear in chunks); above
    that it falls back to 2-key sorts (3.25 vs 2.15 ns/elem at 2^25 — and
    the batched 2-D sorts run 1.1-1.9 ns, benchmarks/micro.jsonl "sort2d").
    Measured: 1M-row d=8 0.340 s unrolled → 0.198 batched; 5M-row d=2
    0.173 → 0.144 (benchmarks/results.jsonl "ab": "batched2d").  64K+ rows
    take the batched plan since round 3 — with the widened k window the
    planner picks the measured grid optima and beats unrolled across the
    mid sizes (ab="auto-verify" variant="batched-auto-widened"/"-r3",
    2026-08-20, all bit-exact): mid-64k 0.0533 → 0.0508 (k=4096),
    cage-128k 0.0804 → 0.0763 (k=16384), mid-256k 0.169 → 0.152 (k=8192).
    Skewed inputs (tri-rmat-s16: 570M-slot plan; rmat-s18: 1.14G) bounce
    off the ``BATCHED_MAX_SLOTS`` guard back to the dealt-unrolled route.
    Below 2^16 rows the unrolled plan stays (blocked-32k class —
    unmeasured under batched, and the dispatch floor dominates anyway).
    """
    shift = int(b.n_cols).bit_length()
    cap = 1 << max(0, 30 - shift)
    return a.n_rows > 160 * cap or a.n_rows >= (1 << 16)


# Tables past this many rows inline their referenced values instead of
# gathering: XLA lowers gathers from big tables through a scratch-space
# transposed layout with relayout copies on both sides.  Profiled cliff
# (2026-08-20, /tmp traces): 186K-row tables gather cleanly (~3.4 ms for
# 1.9M slots), 360K+ rows go pathological (~20 ms for 3.3M slots).  The
# width cap bounds staged-value duplication; inlined values ride the SAME
# flat upload, so staging cost is bytes, not transfers.  Measured wins
# (ab="auto-verify" variants "inline-*", all bit-exact): hypersparse-5m-d2
# 0.0744 -> 0.0521, large-1m-d8 0.1934 -> 0.1464.
INLINE_TABLE_ROWS = 1 << 18
INLINE_TABLE_W_MAX = 16

# Skew guard for the batched 2-D plan: its whole [k, sort_pad] stream is
# resident at once (the unrolled plan streams chunk groups), and per-bin
# class pads are max-over-bins, so power-law inputs that pass the
# prefer_batched row-count rule can still plan multi-GB streams — R-MAT
# s18 forced onto the batched path OOMed at k=512/2048 and crashed the
# remote Mosaic compiler on the auto plan (results.jsonl ab="kgrid"
# 2026-08-20).  Measured plans: hypersparse-5m-d2 36M slots, large-1m-d8
# 96M, rmat-s20-e2 805M — the cap sits 2.8x above the biggest verified
# batched win and 3x below the skew blowup.  Over the cap the auto path
# falls back to the snake-dealt UNROLLED plan (the production route for
# skew), not ESC.
BATCHED_MAX_SLOTS = 1 << 28


def _auto_ell(a: BCSR, b: BCSR, *, masked: bool = False):
    """Build the ELL executor the auto path wants: batched 2-D when the
    many-rows rule says so AND the planned stream passes the skew guard,
    else the unrolled (contig/dealt) plan.  Raises OverflowError only when
    the unrolled plan overflows too (caller falls back to ESC)."""
    if prefer_batched(a, b):
        try:
            return EllSpGEMMExecutor(
                a, b, masked=masked, batched=True,
                batched_slots_cap=BATCHED_MAX_SLOTS,
            )
        except OverflowError:
            pass
    return EllSpGEMMExecutor(a, b, masked=masked)


def tuned_executor(
    a: BCSR,
    b: BCSR,
    *,
    masked: bool = False,
    top: int = 6,
    margin: float = 1.15,
    times: int = 2,
) -> "EllSpGEMMExecutor":
    """Empirically pick the batched plan's bin count by MEASURING the top
    model-ranked candidates on the attached device and keeping the fastest.

    The planner's rate model ranks coarsely in some regimes (mid-256k-d16:
    model argmin k=8192 measured 0.153 s, grid optimum k=32768 measured
    0.135 — results.jsonl ab="kgrid" 2026-08-20); when a staged executor
    will serve many products, one measured round beats any model.  Costs
    one compile + ``times`` runs per candidate (compiles through this
    environment's remote tunnel are 30-300 s each on first use, seconds on
    PCIe-attached hosts or once cached), so this is for long-lived staged
    use — one-shot calls should stay on :func:`auto_executor`.

    The winner carries a ``tune_report`` list of ``(seconds, k)``.
    Candidates whose plan overflows or trips the skew guard are skipped;
    if none survive, falls back to the unrolled plan.
    """
    import time as _time

    try:
        ex0 = EllSpGEMMExecutor(
            a, b, masked=masked, batched=True,
            batched_slots_cap=BATCHED_MAX_SLOTS,
        )
    except OverflowError:
        ex0 = None
    if ex0 is None or not ex0.batched:
        return EllSpGEMMExecutor(a, b, masked=masked)
    # Candidates: every k whose MODEL cost is within ``margin`` of the best
    # (capped at ``top``).  The model's ranking is coarse exactly where
    # tuning matters — at mid-256k the measured optimum (k=32768, 0.1375 s)
    # sits 5th by model cost at 1.085x the argmin — so a fixed top-N by
    # rank would miss it; a cost margin catches every plausibly-best plan.
    ranking = sorted(ex0.k_ranking)
    cutoff = ranking[0][0] * max(margin, 1.0)
    ks = []
    for cost, k in ranking[: max(top, 1)]:
        if cost <= cutoff and k not in ks:
            ks.append(k)
    def _measure(ex):
        # one shared warmup-then-min protocol so every candidate (batched
        # or unrolled) is timed identically — a drifted copy would bias
        # the winner
        out = ex.run()
        np.asarray(out[-1])  # compile + warmup
        ts = []
        for _ in range(max(times, 1)):
            t0 = _time.perf_counter()
            out = ex.run()
            np.asarray(out[-1])
            ts.append(_time.perf_counter() - t0)
        return min(ts)

    report, best, best_t = [], None, float("inf")
    # Build, measure, and release ONE candidate per iteration — each staged
    # executor holds full tables/entries resident in HBM, so accumulating
    # all of them first would multiply the footprint ~(top+1)x and can OOM
    # where any single plan fits.  At most two live at once (current + best).
    # k=0 marks the unrolled plan: near the routing boundary (64k-class
    # inputs) it measures within a few ms of the batched optimum.
    if ex0.n_chunks not in ks:
        ex0 = None  # the seed plan isn't a candidate: release it up front
    for k in ks + [0]:
        try:
            if k == 0:
                ex = EllSpGEMMExecutor(a, b, masked=masked)
            elif ex0 is not None and k == ex0.n_chunks:
                ex = ex0
            else:
                ex = EllSpGEMMExecutor(
                    a, b, masked=masked, batched=True, deal_k=k,
                    batched_slots_cap=BATCHED_MAX_SLOTS,
                )
        except OverflowError:  # incl. the pre-staging skew-guard raise
            continue
        try:
            t = _measure(ex)
        except Exception:  # device rejects the shape (compile/OOM): skip
            if ex is ex0:
                ex0 = None
            del ex
            continue
        report.append((t, k))
        if t < best_t:
            best, best_t = ex, t
        if ex is ex0:
            ex0 = None  # measured: the seed needn't stay resident on a loss
        del ex  # loser (or alias of best) released before the next build
    if best is None:
        return EllSpGEMMExecutor(a, b, masked=masked)
    best.tune_report = sorted(report)
    return best


def auto_executor(a: BCSR, b: BCSR, *, chunk_flops: int | None = None):
    """Pick the faster engine for C = A·B on this input.

    Block-clustered inputs go to the staged MXU engine first
    (:func:`..bsr.maybe_bsr_executor`: occupancy-screened; blocked-32k
    canonical measured 0.027 s vs 0.353 s through the sort path — the
    tiles are resident once staged, so the one-shot tunnel-upload rationale
    that keeps :func:`..spgemm.blocked_route` opt-in does not apply here).
    Otherwise sliced-ELL wins whenever its (padded) expansion fits one
    program — the row-gather expansion is ~6x cheaper than ESC's element
    gather (measured 1.7 vs 10.4 ns/elem, benchmarks/micro.jsonl) at ~1.2x
    slot padding; the batched 2-D variant serves the many-rows regime where
    the unrolled plan's sorts go unpacked (see :func:`prefer_batched` and
    the ``BATCHED_MAX_SLOTS`` skew guard).  The flop-chunked ESC executor
    covers everything larger.
    """
    from .bsr import maybe_bsr_executor
    from .spgemm import SpGEMMExecutor

    bex = maybe_bsr_executor(a, b)
    if bex is not None:
        return bex
    try:
        ex = _auto_ell(a, b)
        if ex.resident_slots <= AUTO_ELL_MAX_SLOTS:
            return ex
    except OverflowError:
        pass
    return SpGEMMExecutor(a, b, chunk_flops=chunk_flops)
