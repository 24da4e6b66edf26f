"""SPMD one-sort accumulation: distributed reachability closure whose rounds
consume uncompacted sentinel-holed streams (VERDICT r04 asks #1/#7).

Single-chip form: :mod:`..ops.onesort` — each closure round R ← R OR R·R
pays ONE sort by carrying demoted duplicates as in-span holes.  Here the
same contract runs under a row-partition mesh (≡ the reference's
``SpGEMM_mpi`` decomposition, final/SpGEMM_mpi_omp.c:155-225, iterated):

* R lives as ``[nd, E]`` per-shard padded column streams + ``[nd, rows_per
  + 1]`` shard-local POSITIONAL row pointers — row-sharded on the mesh,
  never compacted between rounds;
* each round all-gathers the stream (the replicated-B layout — what the
  reference does with its fully-replicated inputs) and prefix-offsets the
  gathered positional pointers into one global pointer table, so a shard's
  expansion gathers any global row's span (holes expand to sort-tail
  sentinels);
* the shard's own stream joins as the fused-OR D-seed, one sort per shard
  per round, and a ``psum`` of valid counts drives the fixpoint test — two
  host scalar syncs per round, no index arrays move until the final pull.

Rows are padded to a multiple of the mesh (empty rows are closure-inert);
equal-rows partition keeps every shard's pointer table the same static
shape (the reference's ``tasksize`` constraint made a virtue: one compile
serves all shards).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.bcsr import BCSR
from ..ops.onesort import _expand_from_padded, _sort_dedup_padded
from ..ops.spgemm import INT, pad_bucket, require_int32_operands
from .mesh import ROWS_AXIS

P = jax.sharding.PartitionSpec

__all__ = ["dist_transitive_closure", "dist_k_hop"]

# Same resident budget as the single-chip device closure, per shard.
from ..ops.graph import DEVICE_CLOSURE_MAX_FLOPS, ONESORT_COMPACT_RATIO


@functools.partial(jax.jit, static_argnames=("mesh",))
def _dist_bound(cols, pos, *, mesh):
    """Per-shard padded-span flop bound [nd, 1] (+ f32 overflow estimate) of
    one product X·Y: Σ over X's valid shard entries of Y's GLOBAL row span
    (``cols`` = X's shard streams, ``pos`` = Y's shard pointers)."""

    def shard_fn(cols, pos):
        e = cols.shape[1]
        g_pos = jax.lax.all_gather(pos[0], ROWS_AXIS)  # [nd, rows_per+1]
        nd = g_pos.shape[0]
        offs = (jnp.arange(nd, dtype=INT) * e)[:, None]
        rows_per = g_pos.shape[1] - 1
        # global positional pointer table [nd*rows_per + 1].  NOTE each
        # shard's all-sentinel tail (positions past its pos[rows_per]) lands
        # inside the span of that shard's LAST row as seen globally — a pure
        # cost (dead sentinel slots in the bound and the gather), never a
        # correctness issue (sentinels expand to sort-tail candidates).
        gp = (g_pos[:, :-1] + offs).reshape(-1)
        gp = jnp.concatenate([gp, g_pos[-1, -1:] + offs[-1]])
        n_pad = nd * rows_per
        valid = cols[0] < n_pad
        acol = jnp.where(valid, cols[0], 0)
        span = jnp.where(valid, gp[acol + 1] - gp[acol], 0)
        return (
            jnp.sum(span, dtype=INT)[None, None],
            jnp.sum(span.astype(jnp.float32))[None, None],
        )

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS), P(ROWS_AXIS)),
        out_specs=(P(ROWS_AXIS), P(ROWS_AXIS)),
    )(cols, pos)


@functools.partial(jax.jit, static_argnames=("mesh", "flops_pad", "seed"))
def _dist_product(xc, xp, yc, yp, *, mesh, flops_pad, seed):
    """One SPMD one-sort product round: X·Y per shard (X row-sharded local,
    Y all-gathered), optionally OR-seeded with X's own stream (the closure
    round R ← R OR R·R is ``seed=True`` with X = Y = R).

    Returns the next ``(cols [nd, flops_pad (+E)], pos, nnz)`` state plus
    the psum'd global valid count (fixpoint scalar).
    """

    def shard_fn(xc, xp, yc, yp):
        c, p = xc[0], xp[0]
        cy, py = yc[0], yp[0]
        e = c.shape[0]
        e_y = cy.shape[0]
        rows_per = p.shape[0] - 1
        g_cols = jax.lax.all_gather(cy, ROWS_AXIS)  # [nd, E_y]
        g_pos = jax.lax.all_gather(py, ROWS_AXIS)
        nd = g_pos.shape[0]
        n_pad = nd * rows_per
        offs = (jnp.arange(nd, dtype=INT) * e_y)[:, None]
        gp = (g_pos[:, :-1] + offs).reshape(-1)
        gp = jnp.concatenate([gp, g_pos[-1, -1:] + offs[-1]])
        # expansion: local X stream (shard-local row ids, sentinel row =
        # rows_per) against the gathered global Y stream; holes in either
        # side expand to sort-tail sentinels (see ops/onesort.py)
        row, col = _expand_from_padded(
            c, p, g_cols.reshape(-1), gp, n_cols=n_pad, flops_pad=flops_pad,
        )
        if seed:
            # fused-OR D-seed: the shard's own stream joins verbatim
            from ..ops.spgemm import _row_ids

            d_rows = _row_ids(p, e)
            d_rows = jnp.where(c < n_pad, d_rows, rows_per)
            d_cols = jnp.where(c < n_pad, c, n_pad)
            row = jnp.concatenate([row, d_rows])
            col = jnp.concatenate([col, d_cols])
        out_cols, out_pos, out_nnz = _sort_dedup_padded(
            row, col, rows_per, n_pad
        )
        total = jax.lax.psum(out_nnz, ROWS_AXIS)
        return (
            out_cols[None],
            out_pos[None],
            out_nnz[None, None],
            total[None, None],
        )

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS),) * 4,
        out_specs=(P(ROWS_AXIS),) * 4,
    )(xc, xp, yc, yp)


def _dist_round(cols, pos, nnz, *, mesh, flops_pad):
    """The closure round R ← R OR R·R (see :func:`_dist_product`)."""
    return _dist_product(
        cols, pos, cols, pos, mesh=mesh, flops_pad=flops_pad, seed=True
    )


@functools.partial(jax.jit, static_argnames=("mesh", "pad_to", "n_pad"))
def _dist_compact(cols, pos, nnz, *, mesh, pad_to, n_pad):
    """Between-round hole compaction, per shard: ONE 2-key sort squeezes the
    stream to ``pad_to`` slots (the ratio gate's escape valve)."""

    def shard_fn(cols, pos, nnz):
        from ..ops.spgemm import _row_ids

        c, p = cols[0], pos[0]
        e = c.shape[0]
        rows_per = p.shape[0] - 1
        rows = _row_ids(p, e)
        valid = c < n_pad
        rows = jnp.where(valid, rows, rows_per)
        ccols = jnp.where(valid, c, n_pad)
        r_s, c_s = jax.lax.sort((rows, ccols), num_keys=2, is_stable=False)
        # valid entries are a prefix (all-sentinel rows sort last); the
        # caller sized pad_to >= the biggest shard's valid count
        out_c = jnp.where(
            r_s[:pad_to] < rows_per, c_s[:pad_to], n_pad
        )
        out_p = jnp.searchsorted(
            r_s, jnp.arange(rows_per + 1, dtype=INT), side="left"
        ).astype(INT)
        out_p = jnp.minimum(out_p, pad_to)
        return out_c[None], out_p[None], nnz

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS)),
        out_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS)),
    )(cols, pos, nnz)


def _stage(a: BCSR, mesh, nd: int, rows_per: int, n_pad: int):
    """Host-stage equal-rows shard streams, padded to one common bucket."""
    n = a.n_rows
    shard_nnz = [
        int(a.indptr[min((s + 1) * rows_per, n)] - a.indptr[min(s * rows_per, n)])
        for s in range(nd)
    ]
    e0 = pad_bucket(max(max(shard_nnz), 1))
    cols_h = np.full((nd, e0), n_pad, np.int32)
    pos_h = np.zeros((nd, rows_per + 1), np.int32)
    for s in range(nd):
        r0, r1 = min(s * rows_per, n), min((s + 1) * rows_per, n)
        base = a.indptr[r0]
        seg = a.indices[base : a.indptr[r1]]
        cols_h[s, : len(seg)] = seg
        local = (a.indptr[r0 : r1 + 1] - base).astype(np.int32)
        pos_h[s, : len(local)] = local
        pos_h[s, len(local) :] = local[-1] if len(local) else 0
    sh = jax.sharding.NamedSharding(mesh, P(ROWS_AXIS))
    return (
        jax.device_put(cols_h, sh),
        jax.device_put(pos_h, sh),
        jax.device_put(np.asarray(shard_nnz, np.int32)[:, None], sh),
    )


def _guarded_pad(xc, yp, mesh) -> int:
    """Static padded flop bound of one X·Y product, raising past the
    per-shard resident budget."""
    fb, est = _dist_bound(xc, yp, mesh=mesh)
    if float(np.max(np.asarray(est))) > 0.98 * DEVICE_CLOSURE_MAX_FLOPS:
        raise OverflowError(
            "per-shard padded round bound exceeds the resident budget; "
            "use the host path or a bigger mesh"
        )
    return pad_bucket(max(int(np.max(np.asarray(fb))), 8))


def _regate(state, mesh, n_pad: int):
    """Between-round hole gate: compact every shard when the common stream
    length outruns the BIGGEST shard by :data:`ONESORT_COMPACT_RATIO`."""
    cols, pos, nnz = state
    max_shard = int(np.max(np.asarray(nnz)))
    if cols.shape[1] > ONESORT_COMPACT_RATIO * max(max_shard, 1):
        return _dist_compact(
            cols, pos, nnz, mesh=mesh,
            pad_to=pad_bucket(max(max_shard, 1)), n_pad=n_pad,
        )
    return state


def _pull(cols, pos, n: int, nd: int, rows_per: int, n_pad: int) -> BCSR:
    """Final pull: filter holes per shard, stitch the row blocks."""
    cols_np = np.asarray(cols)
    pos_np = np.asarray(pos).astype(np.int64)
    indptr = np.zeros(n + 1, np.int64)
    parts = []
    for s in range(nd):
        r0 = s * rows_per
        seg = cols_np[s]
        valid_idx = np.flatnonzero(seg < n_pad)
        counts = np.diff(np.searchsorted(valid_idx, pos_np[s]))
        hi = min(rows_per, n - r0)
        indptr[r0 + 1 : r0 + 1 + hi] = np.cumsum(counts[:hi])
        parts.append(seg[valid_idx][: counts[:hi].sum()])
    # per-shard cumsums → global exclusive pointers
    base = 0
    for s in range(nd):
        r0 = s * rows_per
        hi = min(rows_per, n - r0)
        indptr[r0 + 1 : r0 + 1 + hi] += base
        base = indptr[r0 + hi]
    return BCSR(indptr, np.concatenate(parts), (n, n))


def dist_transitive_closure(
    a: BCSR,
    mesh: jax.sharding.Mesh,
    *,
    max_iters: int | None = None,
) -> BCSR:
    """Row-partitioned SPMD reachability closure on one-sort rounds.

    Semantics ≡ :func:`..ops.graph.transitive_closure`; decomposition ≡ the
    reference's 1-D row partition iterated to fixpoint.  Raises
    OverflowError when any shard's round bound exceeds the per-shard
    resident budget.
    """
    if a.n_rows != a.n_cols:
        raise ValueError("closure needs a square matrix")
    require_int32_operands(a)
    a = a.sum_duplicates()
    nd = mesh.devices.size
    n = a.n_rows
    rows_per = -(-n // nd)
    n_pad = rows_per * nd
    cols, pos, nnz = _stage(a, mesh, nd, rows_per, n_pad)

    iters = max_iters if max_iters is not None else max(1, n.bit_length())
    prev_total = int(np.sum(np.asarray(nnz)))
    for _ in range(iters):
        flops_pad = _guarded_pad(cols, pos, mesh)
        cols, pos, nnz, total = _dist_round(
            cols, pos, nnz, mesh=mesh, flops_pad=flops_pad
        )
        tot = int(np.asarray(total)[0, 0])
        if tot == prev_total:
            break
        prev_total = tot
        cols, pos, nnz = _regate((cols, pos, nnz), mesh, n_pad)
    return _pull(cols, pos, n, nd, rows_per, n_pad)


def dist_k_hop(a: BCSR, mesh: jax.sharding.Mesh, k: int) -> BCSR:
    """Row-partitioned SPMD A^k on one-sort product rounds.

    Binary exponentiation ≡ :func:`..ops.graph.k_hop(device=True)`; each
    product keeps X row-sharded, all-gathers Y's uncompacted stream, and
    pays ONE sort per shard (:func:`_dist_product`, ``seed=False``).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if a.n_rows != a.n_cols:
        raise ValueError("k-hop needs a square matrix")
    require_int32_operands(a)
    a = a.sum_duplicates()
    nd = mesh.devices.size
    n = a.n_rows
    rows_per = -(-n // nd)
    n_pad = rows_per * nd

    def prod(x, y):
        flops_pad = _guarded_pad(x[0], y[1], mesh)
        out = _dist_product(
            x[0], x[1], y[0], y[1], mesh=mesh, flops_pad=flops_pad,
            seed=False,
        )[:3]
        return _regate(out, mesh, n_pad)

    result = None
    power = _stage(a, mesh, nd, rows_per, n_pad)
    while k:
        if k & 1:
            result = power if result is None else prod(result, power)
        k >>= 1
        if k:
            power = prod(power, power)
    return _pull(result[0], result[1], n, nd, rows_per, n_pad)
