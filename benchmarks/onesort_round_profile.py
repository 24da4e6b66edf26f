"""Stage decomposition of one device-resident accumulation round.

Companion to ab_onesort_rounds.py: the closure-round-64k-d4 A/B measured the
one-sort round saving only ~12% device time (vs the ~50% the batched-engine
one-sort A/B measured at mid-64k) — this profiles WHERE the round's device
time goes (profiler buckets: expansion gather / sorts / dedup / other), so
the dilution is a measured decomposition, not a guess.  Expected: the ESC
expansion's per-element gather (~10.4 ns/elem, micro.jsonl) dominates the
resident rounds, capping what removing one sort can save.

Run after ab_onesort_rounds.py (reuses its cached programs).
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
from binary_spgemm_tpu.ops.graph import (
    _guarded_flops_pad,
    _onesort_guarded_pad,
    _step_bound_jit,
)
from binary_spgemm_tpu.ops.device_api import spgemm_or_device
from binary_spgemm_tpu.ops.onesort import (
    PaddedDeviceBCSR,
    spgemm_or_onesort_device,
)
from binary_spgemm_tpu.ops.spgemm import DeviceBCSR
from _provenance import emit


def bucket_of(name: str) -> str:
    n = name.lower()
    if n.startswith("jit_") or ("(" in n and n.index("(") < 4):
        return "_program"
    if "sort" in n:
        return "sort"
    if "gather" in n or "take" in n:
        return "expand-gather"
    if n.startswith(("copy", "%copy")) or "transpose" in n:
        return "layout-copy"
    if "reduce" in n or "searchsorted" in n or "while" in n:
        return "dedup-indptr"
    return "other"


def profile(fn, reps, tdir):
    out = fn()
    np.asarray(out.nnz)
    jax.profiler.start_trace(tdir)
    for _ in range(reps):
        out = fn()
        np.asarray(out.nnz)
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
    return {
        k: round(v / 1e6 / reps, 2)
        for k, v in buckets.most_common()
        if k != "_program"
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 16)
    ap.add_argument("--d", type=float, default=4.0)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    a = BCSR.random(args.n, args.n, args.d, seed=7).sum_duplicates()
    step_bound = _step_bound_jit()
    da = DeviceBCSR.from_host(a)
    pa = PaddedDeviceBCSR.from_host(a)
    r1c = spgemm_or_device(
        da, da, da, flops_pad=_guarded_flops_pad(step_bound, da, da)
    ).compact()
    r1p = spgemm_or_onesort_device(
        pa, pa, pa, flops_pad=_onesort_guarded_pad(pa, pa)
    )
    fp_c = _guarded_flops_pad(step_bound, r1c, r1c)
    fp_p = _onesort_guarded_pad(r1p, r1p)

    stages_c = profile(
        lambda: spgemm_or_device(r1c, r1c, r1c, flops_pad=fp_c).compact(),
        args.reps, f"/tmp/osr_prof_c_{args.n}",
    )
    stages_o = profile(
        lambda: spgemm_or_onesort_device(r1p, r1p, r1p, flops_pad=fp_p),
        args.reps, f"/tmp/osr_prof_o_{args.n}",
    )
    emit(
        {
            "ab": "onesort-round-profile",
            "config": f"closure-round-{args.n >> 10}k-d{args.d:g}",
            "bit_exact": "n/a",  # pure stage decomposition; the paired
            # ab="onesort-rounds" row carries the gated result
            "flops_pad_compact": fp_c,
            "flops_pad_onesort": fp_p,
            "compact_stage_ms": stages_c,
            "onesort_stage_ms": stages_o,
        }
    )


if __name__ == "__main__":
    main()
