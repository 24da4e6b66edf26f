"""A/B timer for the chunked ESC driver (used to measure the one-deep
dispatch/pull pipeline in ops/spgemm.py::spgemm).

Runs C = A·A with a forced chunk_flops on the real chip and prints warm
timings.  Run once on the candidate tree and once on the baseline
(`git stash`) — kernel shapes are identical so the compile cache makes the
second arm free.

Usage: python benchmarks/ab_pipeline.py [--config rmat-s18-e8] [--times 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from binary_spgemm_tpu import BCSR, spgemm


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="rmat-s18-e8")
    ap.add_argument("--times", type=int, default=2)
    ap.add_argument("--chunk-flops", type=int, default=1 << 25)
    args = ap.parse_args()

    if args.config == "rmat-s18-e8":
        a = BCSR.rmat(18, 8.0, seed=7)
    elif args.config == "mid-256k-d16":
        a = BCSR.random(1 << 18, 1 << 18, 16.0, seed=7)
    else:
        raise SystemExit(f"unknown config {args.config}")

    t0 = time.perf_counter()
    c = spgemm(a, a, chunk_flops=args.chunk_flops)
    warm = time.perf_counter() - t0
    print(f"warmup/compile: {warm:.3f}s  output_nnz={c.nnz}")

    ts = []
    for _ in range(args.times):
        t0 = time.perf_counter()
        c = spgemm(a, a, chunk_flops=args.chunk_flops)
        ts.append(time.perf_counter() - t0)
    print(json.dumps({
        "config": args.config,
        "chunk_flops": args.chunk_flops,
        "output_nnz": int(c.nnz),
        "times_s": [round(t, 3) for t in ts],
        "fastest_s": round(min(ts), 3),
    }))


if __name__ == "__main__":
    main()
