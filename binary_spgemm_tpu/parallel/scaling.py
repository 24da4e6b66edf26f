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
        meta = {
            "rows_pad": ops.rows_pad,
            "flops_pad": ops.flops_pad,
            "padded_slots_per_shard": ops.flops_pad,
        }
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
            meta["padded_slots_per_shard"] = step_pad * nd
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
            # each shard processes nd rotated slices of step_pad slots
            "padded_slots_per_shard": step_pad * nd,
        }
    (tables, er, ep, widths, pads, rows_pad, sort_pad, sub, batched) = (
        _shard_ell_operands(
            a, b, mesh, bounds, rf,
            b_tables=("sharded" if b_layout == "sharded" else "replicated"),
            allow_batched=True,
        )
    )
    n_sub = sub.shape[1] - 1
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
        "sub_chunks": n_sub,
        "padded_slots_per_shard": n_sub * sort_pad,
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
    verify: bool = True,
) -> dict:
    """Measure the row-partitioned SPMD step at growing device counts.

    Per count: full-step time (compute + collectives + global pointer fix),
    compute-only time (no collectives) where the split is separable, their
    difference, speedup vs the 1-device step, and strong-scaling efficiency —
    RAW and NORMALIZED.  Raw efficiency ``T(1)/(N·T(N))`` conflates three
    things on a virtual mesh: parallel speedup, per-shard padded-work
    shrinkage (the plan's pads shrink with the shard's flop share), and the
    per-step dispatch floor.  The normalized column removes the latter two:

        eff_norm(N) = (T(1) - floor) · W(N)/W(1) / (N · (T(N) - floor))

    with ``W(N) = N · padded_slots_per_shard(N)`` the total padded work the
    plan actually runs at mesh size N, and ``floor`` the in-run measured
    null-kernel dispatch floor.  ``meets_target`` is computed on the
    NORMALIZED efficiency (VERDICT r03 ask #3 — raw superlinear entries like
    2.3 were pad-shrinkage artifacts, not collective quality).

    CPU-mesh caveat (recorded in the report as ``artifact_note`` when it
    applies): XLA:CPU multi-threads a single-device program across ALL host
    cores, so T(1) is already parallel; N virtual devices on ``c`` physical
    cores cannot speed up more than ``c``, and any mesh size beyond the core
    count measures oversubscription, not scaling.  Efficiency targets are
    meaningful on real multi-chip meshes (ICI), which this environment does
    not have — see BASELINE.md.

    ``engine`` ∈ {"esc", "ell"} × ``b_layout`` ∈ {"replicated", "sharded",
    "ring"} covers every SPMD step the framework ships (the round-2 verdict
    flagged that only esc×replicated was ever measured).  ``verify=True``
    additionally runs the full ``dist_spgemm`` at the largest mesh size and
    bit-exact-checks it against the scipy oracle (provenance for the emitted
    rows).
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

    from ..utils.trace import measure_dispatch_floor

    rf = row_flops(a, b)
    flops_pad1 = pad_bucket(max(int(rf.sum()), 1))
    floor_s = measure_dispatch_floor()
    rows = []
    t1 = w1 = None
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
        w_total = nd * meta.get("padded_slots_per_shard", 0)
        if t1 is None:
            t1, w1 = step_s, w_total
        t1_adj = max(t1 - floor_s, 1e-9)
        tn_adj = max(step_s - floor_s, 1e-9)
        work_ratio = (w_total / w1) if w1 else 1.0
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
                "padded_work_total": w_total,
                "work_vs_1dev": round(work_ratio, 4),
                # parallel quality alone: floor-subtracted, padded-work-
                # normalized (see docstring) — the column meets_target uses
                "efficiency_norm": t1_adj * work_ratio / (nd * tn_adj),
                **meta,
            }
        )
    bit_exact = None
    if verify:
        from .dist_spgemm import dist_spgemm
        from ..utils.oracle import spgemm_oracle

        got = dist_spgemm(
            a, b, make_row_mesh(max(device_counts)),
            balance=balance, b_layout=b_layout, engine=engine,
        )
        bit_exact = bool(got.equals(spgemm_oracle(a, b)))
    multi = [r for r in rows if r["devices"] > 1]
    n_cores = __import__("os").cpu_count() or 1
    platform = jax.devices()[0].platform
    # On a virtual CPU mesh, mesh sizes past the PHYSICAL core count can
    # only measure oversubscription (the artifact_note below), so the
    # target gate quantifies over devices <= cores there; on real
    # multi-chip meshes every size counts.
    gated = [
        r for r in multi
        if platform != "cpu" or r["devices"] <= n_cores
    ]
    rep = {
        "kind": "scaling_report",
        "engine": engine,
        "b_layout": b_layout,
        "n": a.n_rows,
        "input_nnz": a.nnz,
        "flops": int(rf.sum()),
        "balance": balance,
        "platform": platform,
        "host_cores": n_cores,
        "floor_s": round(floor_s, 6),
        "bit_exact": bit_exact,
        "efficiency_target": EFFICIENCY_TARGET,
        "meets_target": bool(
            gated
            and all(r["efficiency_norm"] >= EFFICIENCY_TARGET for r in gated)
        ),
        "meets_target_scope": (
            f"devices<={n_cores} (physical cpu cores)"
            if platform == "cpu" and any(
                r["devices"] > n_cores for r in multi
            )
            else "all mesh sizes"
        ),
        "rows": rows,
    }
    if platform == "cpu" and max(device_counts) > n_cores:
        rep["artifact_note"] = (
            f"virtual CPU mesh: XLA:CPU threads the 1-device baseline over "
            f"all {n_cores} cores, so mesh sizes past {n_cores} devices "
            "measure oversubscription, not scaling; ICI efficiency needs a "
            "real multi-chip mesh (BASELINE.md)"
        )
    return rep


def format_scaling_report(rep: dict) -> str:
    lines = [
        f"scaling report: n={rep['n']} nnz={rep['input_nnz']} "
        f"flops={rep['flops']} platform={rep['platform']} "
        f"engine={rep.get('engine', 'esc')} "
        f"b_layout={rep.get('b_layout', 'replicated')}",
        f"{'devices':>8} {'step_s':>10} {'compute_s':>10} "
        f"{'collective_s':>12} {'speedup':>8} {'efficiency':>10} "
        f"{'eff_norm':>9} {'work':>6}",
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
        en = r.get("efficiency_norm")
        en_s = f"{en:>9.2%}" if en is not None else f"{'-':>9}"
        wr = r.get("work_vs_1dev")
        wr_s = f"{wr:>6.2f}" if wr is not None else f"{'-':>6}"
        lines.append(
            f"{r['devices']:>8} {r['step_s']:>10.5f} {comp} "
            f"{coll} {r['speedup']:>8.2f} "
            f"{r['efficiency']:>10.2%} {en_s} {wr_s}"
        )
    lines.append(
        f"target >= {rep['efficiency_target']:.0%} (normalized) for N>=2: "
        + ("MET" if rep["meets_target"] else "NOT MET")
    )
    if rep.get("artifact_note"):
        lines.append(f"note: {rep['artifact_note']}")
    return "\n".join(lines)
