"""Scaling-efficiency sweep over every SPMD step the framework ships:
(engine ∈ {esc, ell}) × (b_layout ∈ {replicated, sharded, ring}) on the
8-virtual-device CPU mesh (no multi-chip hardware in this environment — the
same command measures real ICI scaling on a pod).  Emits one
``"kind": "scaling_report"`` row per combo to results.jsonl — the published
analogue of the reference's multi-node trend (report §3 figs 9-10,
BASELINE.md:16).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/scaling_sweep.py [--n N] [--d D]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Scaling needs N virtual devices — force the CPU mesh by RE-EXECing with
# the right env so a bare `python benchmarks/scaling_sweep.py` cannot
# silently run single-device on the attached TPU (happened once:
# 2026-08-20 rows purged).  Setting os.environ inside the script is too
# late here — this image's sitecustomize registers the axon TPU at
# interpreter start, before any script code runs.
if os.environ.get("JAX_PLATFORMS") != "cpu":
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    if "--xla_force_host_platform_device_count" not in env.get(
        "XLA_FLAGS", ""
    ):
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.parallel.scaling import scaling_report

from _provenance import emit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 16)
    ap.add_argument("--d", type=float, default=8.0)
    ap.add_argument("--times", type=int, default=3)
    ap.add_argument(
        "--engines", default="esc,ell",
        help="comma-separated engine filter (esc,ell) — ESC steps at "
        "n>=1M run XLA:CPU's single-threaded sorts and can take an hour",
    )
    ap.add_argument(
        "--layouts", default="replicated,sharded,ring",
        help="comma-separated b_layout filter",
    )
    args = ap.parse_args()
    a = BCSR.random(args.n, args.n, args.d, seed=7)
    for engine in args.engines.split(","):
        for layout in args.layouts.split(","):
            rep = scaling_report(
                a, engine=engine, b_layout=layout, times=args.times
            )
            rep["config"] = f"scaling-{args.n}-d{args.d:g}"
            emit(rep)


if __name__ == "__main__":
    main()
