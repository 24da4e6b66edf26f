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
from .mesh import ROWS_AXIS, make_row_mesh
from .dist_spgemm import shard_operands, dist_spgemm_sharded

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


def scaling_report(
    a: BCSR,
    b: BCSR | None = None,
    *,
    device_counts: list[int] | None = None,
    balance: str = "flops",
    times: int = 3,
) -> dict:
    """Measure the row-partitioned SPMD step at growing device counts.

    Per count: full-step time (compute + collectives + global pointer fix),
    compute-only time (no collectives), their difference, speedup vs the
    1-device step, and strong-scaling efficiency.  The flop pad is held at
    the 1-device value so every mesh size runs the same total padded work —
    efficiencies compare honestly.
    """
    b = a if b is None else b
    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]
    if max(device_counts) > n_avail:
        raise ValueError(
            f"device_counts {device_counts} exceed available {n_avail}"
        )

    rf = row_flops(a, b)
    flops_pad = pad_bucket(max(int(rf.sum()), 1))
    rows = []
    t1 = None
    for nd in device_counts:
        mesh = make_row_mesh(nd)
        # per-shard flop pad = total/nd padded: each mesh size does the same
        # padded work in total
        ops = shard_operands(
            a, b, mesh, balance=balance,
            flops_pad=max(flops_pad // nd, 1),
        )
        kw = dict(mesh=mesh, n_cols=b.n_cols, flops_pad=ops.flops_pad)

        def step():
            return dist_spgemm_sharded(
                ops.a_ptr, ops.a_idx, ops.a_nnz, ops.b_ptr, ops.b_idx, **kw
            )

        def compute():
            return _compute_only_sharded(
                ops.a_ptr, ops.a_idx, ops.a_nnz, ops.b_ptr, ops.b_idx, **kw
            )

        step_s = _timed(step, lambda o: np.asarray(o[3]), times)
        compute_s = _timed(
            compute, lambda o: np.asarray(o[2]).ravel()[:1], times
        )
        if t1 is None:
            t1 = step_s
        rows.append(
            {
                "devices": nd,
                "step_s": step_s,
                "compute_s": compute_s,
                "collective_s": max(step_s - compute_s, 0.0),
                "speedup": t1 / step_s,
                "efficiency": t1 / (nd * step_s),
                "rows_pad": ops.rows_pad,
                "flops_pad": ops.flops_pad,
            }
        )
    multi = [r for r in rows if r["devices"] > 1]
    return {
        "kind": "scaling_report",
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
        f"flops={rep['flops']} platform={rep['platform']}",
        f"{'devices':>8} {'step_s':>10} {'compute_s':>10} "
        f"{'collective_s':>12} {'speedup':>8} {'efficiency':>10}",
    ]
    for r in rep["rows"]:
        lines.append(
            f"{r['devices']:>8} {r['step_s']:>10.5f} {r['compute_s']:>10.5f} "
            f"{r['collective_s']:>12.5f} {r['speedup']:>8.2f} "
            f"{r['efficiency']:>10.2%}"
        )
    lines.append(
        f"target >= {rep['efficiency_target']:.0%} for N>=2: "
        + ("MET" if rep["meets_target"] else "NOT MET")
    )
    return "\n".join(lines)
