"""Closure evidence for the round-3 stream-assembly lever (VERDICT r03 ask
#1): per-stage DEVICE-time decomposition of the hypersparse auto path from a
real profiler trace, bucketed per HLO op.

Round 3 measured stream assembly at 2/3 of hypersparse device time
(23.9 of 47 ms, 0.67 ns/slot vs 0.21 at mid-256k) under the coarse k=32768
plan (L=1088, just past the 1024 sort cliff).  Round 4's pow2-cliff k
refinement (k=40960, L=928) plus the direct packed-key stream assembly
(ab="key-stream") removed the pathology; this harness records where the
device time now goes and the achieved ns/slot so the claim is a measured
row, not a narrative.

Run: python benchmarks/assembly_close.py [--config hypersparse-5m-d2]
Appends ab="assembly-close" rows to results.jsonl.
"""
import argparse
import collections
import glob
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
from binary_spgemm_tpu.ops.ell import auto_executor
from binary_spgemm_tpu.utils.trace import measure_dispatch_floor
from _provenance import emit

CONFIGS = {
    "hypersparse-5m-d2": dict(n=5_000_000, d=2.0, seed=7),
    "mid-64k-d16": dict(n=1 << 16, d=16.0, seed=7),
    "mid-256k-d16": dict(n=1 << 18, d=16.0, seed=7),
}


def bucket_of(name: str) -> str:
    if name.startswith("jit_") or "(" in name and name.index("(") < 4:
        return "_program"
    # lax.sort HLOs, and the Pallas bitonic kernel's platform_dependent
    # branch custom-calls (ops/bitonic.py::sort_rows)
    if "sort" in name or "branch_" in name:
        return "sort"
    if name.startswith(("copy", "%copy")):
        return "layout-copy"
    if "reduce" in name:
        return "dedup-reduce"
    # concat DMA slices, piece fusions, gathers, broadcasts: the assembly
    return "assembly"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="hypersparse-5m-d2")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    cfg = CONFIGS[args.config]
    tdir = f"/tmp/close_{args.config.replace('-', '_')}"

    a = BCSR.random(cfg["n"], cfg["n"], cfg["d"], seed=cfg["seed"])
    ref = a.to_scipy() @ a.to_scipy()
    ref.sort_indices()
    ex = auto_executor(a, a)
    floor = measure_dispatch_floor()

    out = ex.run()
    np.asarray(out[-1])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = ex.run()
        np.asarray(out[-1])
        ts.append(time.perf_counter() - t0)
    c = ex.assemble(out)
    exact = bool(
        np.array_equal(c.indptr, ref.indptr)
        and np.array_equal(c.indices, ref.indices)
    )

    jax.profiler.start_trace(tdir)
    for _ in range(args.reps):
        out = ex.run()
        np.asarray(out[-1])
    jax.profiler.stop_trace()
    pbs = sorted(glob.glob(os.path.join(tdir, "plugins/profile/*/*.xplane.pb")))
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(pbs[-1], "rb").read()
    )
    buckets = collections.Counter()
    for plane in data.planes:
        if "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                buckets[bucket_of(ev.name)] += ev.duration_ns
    per_run_ms = {
        k: round(v / 1e6 / args.reps, 3)
        for k, v in buckets.items()
        if k != "_program"
    }
    slots = ex.n_chunks * ex.sort_pad
    asm_ns_slot = (
        (buckets["assembly"] + buckets["layout-copy"])
        / args.reps / max(slots, 1)
    )
    sort_ns_elem = buckets["sort"] / args.reps / max(2 * slots, 1)
    rec = {
        "ab": "assembly-close", "config": args.config,
        "k": ex.n_chunks, "sort_pad": ex.sort_pad, "slots": slots,
        "e2e_s": round(min(ts), 5), "floor_s": round(floor, 6),
        "device_s": round(min(ts) - floor, 5),
        "stage_ms_per_run": per_run_ms,
        "assembly_ns_per_slot": round(asm_ns_slot, 3),
        "sort_ns_per_elem_each": round(sort_ns_elem, 3),
        "bit_exact": exact,
    }
    emit(rec)
    print(rec)
    assert exact


if __name__ == "__main__":
    main()
