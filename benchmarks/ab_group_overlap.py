"""A/B: split the small-config batched multiply into multiple dispatch
groups to pipeline assembly against sorts (VERDICT r04 ask #6).

mid-64k pays sorts 17.5 ms + assembly 14.7 ms only partially overlapped
inside its ONE dispatch (k=4096 × sort_pad 4096 = 16.8M slots, well under
the 2^27 DISPATCH_SLOT_BUDGET), while mid-256k — same kernel structure at
8× the slots — hides most of its 43.6 ms assembly behind 70.3 ms of sorts
(ab="assembly-close").  Hypothesis: the XLA scheduler overlaps better with
more independent chunk rows in flight; queueing the program as G async
dispatch groups gives it G-deep cross-dispatch pipelining for free (the
dispatches queue without host syncs; only the final pull syncs).

This harness forces group counts {1 (auto), 2, 4, 8} on the mid-64k and
hypersparse plans by shrinking the per-dispatch slot budget, times each
bit-exact, and emits ab="group-overlap" rows.  A loss confirms the round-1
"one big kernel beats chunked dispatch" finding at this scale; a win sets a
small-config group heuristic.

Run: python benchmarks/ab_group_overlap.py [--configs mid-64k-d16,...]
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
from binary_spgemm_tpu.ops import ell as ell_mod
from binary_spgemm_tpu.utils.trace import measure_dispatch_floor
from _provenance import emit

CONFIGS = {
    "mid-64k-d16": dict(n=1 << 16, d=16.0, seed=7),
    "hypersparse-5m-d2": dict(n=5_000_000, d=2.0, seed=7),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="mid-64k-d16")
    ap.add_argument("--groups", default="1,2,4,8")
    ap.add_argument("--times", type=int, default=5)
    args = ap.parse_args()

    floor = measure_dispatch_floor()
    for name in args.configs.split(","):
        cfg = CONFIGS[name]
        a = BCSR.random(cfg["n"], cfg["n"], cfg["d"], seed=cfg["seed"])
        ref = a.to_scipy() @ a.to_scipy()
        ref.sort_indices()
        budget0 = ell_mod.DISPATCH_SLOT_BUDGET
        for g in [int(x) for x in args.groups.split(",")]:
            try:
                ex0 = ell_mod.auto_executor(a, a)
                if not getattr(ex0, "batched", False):
                    raise RuntimeError("config not batched")
                slots = ex0.n_chunks * ex0.sort_pad
                if g > 1:
                    # shrink the per-dispatch budget so __init__ plans g groups
                    ell_mod.DISPATCH_SLOT_BUDGET = max(slots // g, ex0.sort_pad)
                    ex = ell_mod.EllSpGEMMExecutor(
                        a, a, batched=True,
                        batched_slots_cap=ell_mod.BATCHED_MAX_SLOTS,
                    )
                else:
                    ex = ex0
                out = ex.run()
                np.asarray(out[-1])
                ts = []
                for _ in range(args.times):
                    t0 = time.perf_counter()
                    out = ex.run()
                    np.asarray(out[-1])
                    ts.append(time.perf_counter() - t0)
                c = ex.assemble(out)
                exact = bool(
                    np.array_equal(c.indptr, ref.indptr)
                    and np.array_equal(c.indices, ref.indices)
                )
                emit(
                    {
                        "ab": "group-overlap", "config": name,
                        "groups": ex.n_groups, "group_size": ex.group_size,
                        "k": ex.n_chunks, "sort_pad": ex.sort_pad,
                        "fastest_s": min(ts),
                        "floor_s": round(floor, 6),
                        "device_s": round(min(ts) - floor, 6),
                        "bit_exact": exact,
                    }
                )
                assert exact
            finally:
                ell_mod.DISPATCH_SLOT_BUDGET = budget0


if __name__ == "__main__":
    main()
