"""Trace one canonical config's auto-path engine run and summarize per-HLO-op
device time (the round-3/4 profiling loop: trace -> name the op -> targeted
fix -> bit-exact A/B).  Usage:

    python benchmarks/profile_config.py hypersparse [--trace-dir /tmp/hs4]

Prints per-op device-time totals (ex async-start windows) and writes the raw
xplane under the trace dir for reinspection.
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = {
    "hypersparse": dict(n=5_000_000, d=2.0, kind="uniform"),
    "mid-64k": dict(n=1 << 16, d=16.0, kind="uniform"),
    "mid-256k": dict(n=1 << 18, d=16.0, kind="uniform"),
    "large-1m": dict(n=1 << 20, d=8.0, kind="uniform"),
    "cage": dict(n=1 << 17, d=16.0, kind="banded"),
    "rmat-s18": dict(n=1 << 18, d=8.0, kind="rmat"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=sorted(CONFIGS))
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    cfg = CONFIGS[args.config]
    tdir = args.trace_dir or f"/tmp/prof_{args.config.replace('-', '_')}"

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from binary_spgemm_tpu import BCSR
    from binary_spgemm_tpu.ops.ell import auto_executor
    from binary_spgemm_tpu.utils.trace import measure_dispatch_floor

    n, d, kind = cfg["n"], cfg["d"], cfg["kind"]
    if kind == "rmat":
        a = BCSR.rmat(n.bit_length() - 1, d, seed=7)
    elif kind == "banded":
        a = BCSR.banded(n, d, 512, seed=7)
    else:
        a = BCSR.random(n, n, d, seed=7)
    t0 = time.perf_counter()
    ex = auto_executor(a, a)
    print(f"build: {time.perf_counter() - t0:.2f}s  engine={type(ex).__name__} "
          f"batched={getattr(ex, 'batched', None)} k={ex.n_chunks} "
          f"rows_pad={getattr(ex, 'rows_pad', None)} "
          f"sort_pad={getattr(ex, 'sort_pad', None)}", flush=True)
    floor = measure_dispatch_floor()

    def sync(o):
        np.asarray(o[-1])

    t0 = time.perf_counter()
    out = ex.run()
    sync(out)
    print(f"compile_or_cached: {time.perf_counter() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = ex.run()
        sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"e2e fastest {min(ts):.5f}s  floor {floor:.4f}s  "
          f"device ~{min(ts) - floor:.5f}s", flush=True)

    jax.profiler.start_trace(tdir)
    for _ in range(args.reps):
        out = ex.run()
        sync(out)
    jax.profiler.stop_trace()

    pbs = sorted(glob.glob(os.path.join(tdir, "plugins/profile/*/*.xplane.pb")))
    assert pbs, f"no xplane written under {tdir}"
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(pbs[-1], "rb").read()
    )
    tot, cnt = collections.Counter(), collections.Counter()
    for plane in data.planes:
        if "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                tot[ev.name] += ev.duration_ns
                cnt[ev.name] += 1
    print(f"\nper-op device time over {args.reps} reps "
          f"(divide by {args.reps} for per-run):")
    for name, ns in tot.most_common(34):
        print(f"{ns / 1e6:9.2f} ms  x{cnt[name]:<4d} {name[:130]}")


if __name__ == "__main__":
    main()
