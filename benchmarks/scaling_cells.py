"""Per-cell diagnosis of the production-engine scaling matrix.

VERDICT r04 ask #4: ell-replicated meets the ≥0.8 normalized target at 4M
but scored 0.64 at 1M/N=4, ell-sharded the reverse (0.82 at 1M, 0.72 at
4M), and ring was never run at 4M.  ``efficiency_norm`` already removes the
dispatch floor and padded-work shrinkage, but on a virtual CPU mesh one
confound remains that no in-process normalization can remove: **XLA:CPU
threads the 1-device baseline across all physical cores**, so T(1) is
already a parallel time and the quotient under-reads true scaling by
whatever intra-op speedup the baseline got.

This harness quantifies that confound per cell: it re-times the SAME
1-device step in a ``taskset -c 0`` subprocess (a genuinely serial
baseline, floor measured in-process) and reports

    eff_serial(N) = (T1_pinned - floor1) * W(N)/W(1) / (N * (T(N) - floor))

alongside the in-process ``efficiency_norm``.  A cell whose eff_serial
meets the target while efficiency_norm misses it is MEASURED to fail only
through the parallel-baseline artifact; a cell missing both has a real
collective/imbalance cost, which the compute/collective split names.

Usage: python benchmarks/scaling_cells.py [--cells 1m:replicated,4m:sharded,...]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("JAX_PLATFORMS") != "cpu":
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    if "--xla_force_host_platform_device_count" not in env.get("XLA_FLAGS", ""):
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import jax

jax.config.update("jax_platforms", "cpu")

SIZES = {"1m": (1 << 20, 8.0), "4m": (1 << 22, 4.0)}

_PINNED_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.parallel.scaling import _build_step
from binary_spgemm_tpu.parallel.mesh import make_row_mesh
from binary_spgemm_tpu.ops.spgemm import row_flops, pad_bucket
from binary_spgemm_tpu.utils.trace import measure_dispatch_floor

n, d, engine, layout, times = json.loads(sys.argv[1])
a = BCSR.random(n, n, d, seed=7)
rf = row_flops(a, a)
mesh = make_row_mesh(1)
step, _, sync, meta = _build_step(
    a, a, engine, layout, mesh, "flops", pad_bucket(max(int(rf.sum()), 1)), rf
)
floor = measure_dispatch_floor()
out = step(); sync(out)
ts = []
for _ in range(times):
    t0 = time.perf_counter(); out = step(); sync(out)
    ts.append(time.perf_counter() - t0)
print(json.dumps({
    "t1_pinned_s": min(ts), "floor_pinned_s": floor,
    "padded_slots_per_shard": meta.get("padded_slots_per_shard", 0),
}))
"""


def pinned_baseline(n, d, engine, layout, times):
    """1-device step timed on ONE physical core (taskset -c 0): the serial
    baseline XLA:CPU's intra-op threading denies the in-process report."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    # cap XLA:CPU's own thread pool too — taskset bounds the cores, the
    # flag stops the runtime from time-slicing a wide pool over one core
    env["XLA_CPU_THREADS"] = "1"
    out = subprocess.run(
        ["taskset", "-c", "0", sys.executable, "-c", _PINNED_SNIPPET,
         json.dumps([n, d, engine, layout, times])],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"pinned baseline failed: {out.stderr[-800:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--cells",
        default="1m:replicated,1m:sharded,1m:ring,4m:replicated,4m:sharded,4m:ring",
    )
    ap.add_argument("--times", type=int, default=3)
    args = ap.parse_args()

    import numpy as np

    from binary_spgemm_tpu import BCSR
    from binary_spgemm_tpu.parallel.scaling import scaling_report
    from _provenance import emit

    for cell in args.cells.split(","):
        size, layout = cell.split(":")
        n, d = SIZES[size]
        a = BCSR.random(n, n, d, seed=7)
        rep = scaling_report(
            a, engine="ell", b_layout=layout,
            device_counts=[1, 2, 4], times=args.times,
        )
        pin = pinned_baseline(n, d, "ell", layout, args.times)
        t1p = pin["t1_pinned_s"] - pin["floor_pinned_s"]
        w1 = rep["rows"][0]["padded_work_total"]
        for r in rep["rows"]:
            if r["devices"] == 1:
                continue
            tn = max(r["step_s"] - rep["floor_s"], 1e-9)
            r["efficiency_serial"] = (
                t1p * (r["padded_work_total"] / w1) / (r["devices"] * tn)
            )
        rep["config"] = f"scaling-cell-{size}-ell-{layout}"
        rep["t1_pinned_s"] = pin["t1_pinned_s"]
        rep["floor_pinned_s"] = pin["floor_pinned_s"]
        rep["ab"] = "scaling-cells"
        emit(rep)
        del a


if __name__ == "__main__":
    main()
