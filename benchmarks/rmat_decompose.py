"""Per-stage device-time decomposition of the dealt-unrolled engine on
rmat-s18 (VERDICT r04 ask #3).

rmat-s18 is the longest-running canonical config (2.07 s device) and sits at
0.62 of its measured dual-roofline ceiling with the 38% gap unattributed —
the ab="assembly-close" profiler-bucket methodology only ever ran on the
batched configs.  This harness applies it to the unrolled engine: one
profiler trace of the production run, HLO events bucketed into expansion
gathers / stream assembly / sorts / dedup / layout copies, per-run ms and
achieved rates emitted as an ab="rmat-decompose" row.

The unrolled engine's structure per chunk group (ops/ell.py::_flat_spgemm_sep):
per-class row gathers expand the entries (pair streams — the 1-D key-stream
form measured +12.7% and was rejected, ab="key-stream-1d"), the streams
concat with embedded separators, one 2-key sort orders them, a shifted
compare dedups, and a second 2-key sort compacts.

Run: python benchmarks/rmat_decompose.py [--config rmat-s18-e8] [--reps 2]
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
    "rmat-s18-e8": dict(scale=18, d=8.0, seed=7),
    "tri-rmat-s16": dict(scale=16, d=8.0, seed=7, symmetric=True),
}


def bucket_of(name: str) -> str:
    n = name.lower()
    if n.startswith("jit_") or ("(" in n and n.index("(") < 4):
        return "_program"
    if "sort" in n or "branch_" in n:
        return "sort"
    if "gather" in n or "take" in n:
        return "expand-gather"
    if n.startswith(("copy", "%copy")) or "transpose" in n:
        return "layout-copy"
    if "reduce" in n:
        return "dedup-reduce"
    if "concatenate" in n or "pad" in n or "broadcast" in n or "iota" in n:
        return "stream-assembly"
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="rmat-s18-e8")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    cfg = CONFIGS[args.config]
    tdir = f"/tmp/rmatdec_{args.config.replace('-', '_')}"

    a = BCSR.rmat(
        cfg["scale"], cfg["d"], seed=cfg["seed"],
        symmetric=cfg.get("symmetric", False),
    )
    if cfg.get("symmetric"):
        rows, cols = a.to_coo()
        off = rows != cols
        a = BCSR.from_coo(rows[off], cols[off], a.shape)
    ref = a.to_scipy() @ a.to_scipy()
    ref.sort_indices()
    ex = auto_executor(a, a)
    floor = measure_dispatch_floor()

    out = ex.run()
    np.asarray(out[-1])
    ts = []
    for _ in range(3):
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
    top = collections.Counter()
    for plane in data.planes:
        if "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                b = bucket_of(ev.name)
                buckets[b] += ev.duration_ns
                if b != "_program":
                    top[ev.name] += ev.duration_ns
    per_run_ms = {
        k: round(v / 1e6 / args.reps, 2)
        for k, v in buckets.most_common()
        if k != "_program"
    }
    slots = ex.n_chunks * ex.sort_pad
    rec = {
        "ab": "rmat-decompose", "config": args.config,
        "engine": "ell-unrolled" if not ex.batched else "ell-batched",
        "k": ex.n_chunks, "sort_pad": ex.sort_pad, "slots": slots,
        "e2e_s": round(min(ts), 5), "floor_s": round(floor, 6),
        "device_s": round(min(ts) - floor, 5),
        "stage_ms_per_run": per_run_ms,
        "sort_ns_per_elem_each": round(
            buckets["sort"] / args.reps / max(2 * slots, 1), 4
        ),
        "top_ops_ms": {
            k: round(v / 1e6 / args.reps, 2) for k, v in top.most_common(12)
        },
        "bit_exact": exact,
    }
    emit(rec)
    assert exact


if __name__ == "__main__":
    main()
