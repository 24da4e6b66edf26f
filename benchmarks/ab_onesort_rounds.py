"""A/B: one-sort vs compacted device-resident accumulation rounds.

VERDICT r04 ask #1: the measured one-sort contract (−24..50% device time,
ab="one-sort") must be consumed by a production pipeline.  This harness
times ONE accumulation round — the closure step R ← R OR R·R and the k-hop
step P ← P·P — through both paths on the real chip:

* compact:   ``spgemm_or_device``/``spgemm_device`` + between-round
  ``.compact()`` (two sorts per round — what ``transitive_closure(device=
  True, one_sort=False)`` runs);
* one-sort:  ``spgemm_or_onesort_device``/``spgemm_onesort_device`` over
  the PREVIOUS round's uncompacted hole-y stream (one sort per round —
  the ``one_sort=True`` default).

The round input is itself each engine's own round-1 output (so the one-sort
operand really carries holes), and both engines' round-2 outputs are
bit-exact-gated against the scipy oracle before any timing is trusted.

Usage: python benchmarks/ab_onesort_rounds.py [--times N] [--configs a,b]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks._provenance import emit

CONFIGS = [
    # (name, n, d): round-2 padded flop bounds must clear the 2^28 resident
    # budget AND stay inside the remote compiler's tractable envelope —
    # fresh fused one-/two-sort programs at ≥37M slots sat 35-50 min in
    # the remote compiler without returning (256k-d4 ~80M and 1m-d2 ~37M
    # attempts, both killed; the known huge-shape compile pathology,
    # CLAUDE.md).  These land round 2 at 17-23M slots: tens-of-ms device
    # times, minutes-class compiles.
    ("closure-round-64k-d4", 1 << 16, 4.0),
    ("khop-round-64k-d4", 1 << 16, 4.0),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--times", type=int, default=5)
    ap.add_argument("--configs", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from binary_spgemm_tpu import BCSR
    from binary_spgemm_tpu.ops.device_api import (
        spgemm_device,
        spgemm_or_device,
    )
    from binary_spgemm_tpu.ops.graph import _guarded_flops_pad, _step_bound_jit
    from binary_spgemm_tpu.ops.onesort import (
        PaddedDeviceBCSR,
        spgemm_onesort_device,
        spgemm_or_onesort_device,
    )
    from binary_spgemm_tpu.ops.spgemm import DeviceBCSR
    from binary_spgemm_tpu.ops.graph import _onesort_guarded_pad
    from binary_spgemm_tpu.utils.trace import measure_dispatch_floor

    floor_s = measure_dispatch_floor()
    configs = CONFIGS
    if args.configs:
        wanted = set(args.configs.split(","))
        configs = [c for c in configs if c[0] in wanted]

    for name, n, d in configs:
        a = BCSR.random(n, n, d, seed=7).sum_duplicates()
        sp = a.to_scipy()
        khop = name.startswith("khop")
        step_bound = _step_bound_jit()

        # ---- round 1 (untimed): each engine produces its own round input
        da = DeviceBCSR.from_host(a)
        pa = PaddedDeviceBCSR.from_host(a)
        if khop:
            r1c = spgemm_device(
                da, da, flops_pad=_guarded_flops_pad(step_bound, da, da)
            ).compact()
            r1p = spgemm_onesort_device(
                pa, pa, flops_pad=_onesort_guarded_pad(pa, pa)
            )
            sp1 = sp @ sp
            sp1.sort_indices()
            sp2 = sp1 @ sp1
        else:
            r1c = spgemm_or_device(
                da, da, da, flops_pad=_guarded_flops_pad(step_bound, da, da)
            ).compact()
            r1p = spgemm_or_onesort_device(
                pa, pa, pa, flops_pad=_onesort_guarded_pad(pa, pa)
            )
            sp1 = ((sp + sp @ sp) > 0).astype(np.int8).tocsr()
            sp1.sort_indices()
            sp2 = ((sp1 + sp1 @ sp1) > 0).astype(np.int8).tocsr()
        sp2.sort_indices()
        ref2 = BCSR.from_scipy(sp2)

        # ---- round 2: the timed round, through each engine
        fp_c = _guarded_flops_pad(step_bound, r1c, r1c)
        fp_p = _onesort_guarded_pad(r1p, r1p)
        hole_ratio = r1p.stream_len / max(int(r1p.nnz), 1)

        def round_compact():
            if khop:
                out = spgemm_device(r1c, r1c, flops_pad=fp_c)
            else:
                out = spgemm_or_device(r1c, r1c, r1c, flops_pad=fp_c)
            return out.compact()  # the between-round protocol (nnz sync)

        def round_onesort():
            if khop:
                out = spgemm_onesort_device(r1p, r1p, flops_pad=fp_p)
            else:
                out = spgemm_or_onesort_device(r1p, r1p, r1p, flops_pad=fp_p)
            int(out.nnz)  # the same per-round host sync (fixpoint check)
            return out

        results = {}
        for tag, fn in (("compact", round_compact), ("onesort", round_onesort)):
            out = fn()  # compile + warm
            t0 = time.perf_counter()
            out = fn()
            warm_s = time.perf_counter() - t0
            ts = []
            for _ in range(args.times):
                t0 = time.perf_counter()
                out = fn()
                ts.append(time.perf_counter() - t0)
            c2 = out.to_host()
            exact = c2.equals(ref2)
            assert exact, (name, tag, c2.nnz, ref2.nnz)
            results[tag] = dict(fastest=min(ts), warm=warm_s, exact=exact)

        fc, fo = results["compact"]["fastest"], results["onesort"]["fastest"]
        emit(
            {
                "ab": "onesort-rounds",
                "config": name,
                "bit_exact": bool(
                    results["compact"]["exact"] and results["onesort"]["exact"]
                ),
                "n": n,
                "d": d,
                "round_nnz_in": int(r1c.nnz),
                "round_nnz_out": ref2.nnz,
                "flops_pad_compact": fp_c,
                "flops_pad_onesort": fp_p,
                "onesort_hole_ratio": round(hole_ratio, 4),
                "compact_fastest_s": fc,
                "onesort_fastest_s": fo,
                "floor_s": round(floor_s, 6),
                "compact_device_s": round(max(fc - floor_s, 0.0), 6),
                "onesort_device_s": round(max(fo - floor_s, 0.0), 6),
                "device_saving_pct": round(
                    100
                    * (1 - max(fo - floor_s, 0.0) / max(fc - floor_s, 1e-9)),
                    2,
                ),
            }
        )


if __name__ == "__main__":
    main()
