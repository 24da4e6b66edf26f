"""Empirical deal_k grid for the batched 2-D engine on the perf-target
configs — the ground truth the planner's cost model is calibrated against
(run after model changes; appends ab="kgrid" rows to results.jsonl)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor

from _provenance import emit, sort_fraction

GRID = {
    "hypersparse-5m-d2": (dict(n=5_000_000, d=2.0, seed=11),
                          (16384, 32768, 65536, 131072)),
    "large-1m-d8": (dict(n=1_000_000, d=8.0, seed=7),
                    (2048, 8192, 32768)),
}


def time_run(ex, n=5):
    out = ex.run()
    np.asarray(out[-1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = ex.run()
        np.asarray(out[-1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


for name, (cfg, ks) in GRID.items():
    a = BCSR.random(cfg["n"], cfg["n"], cfg["d"], seed=cfg["seed"])
    ref = a.to_scipy() @ a.to_scipy()
    ref.sort_indices()
    for k in ks:
        t0 = time.perf_counter()
        ex = EllSpGEMMExecutor(a, a, batched=True, deal_k=k)
        build_s = time.perf_counter() - t0
        t = time_run(ex)
        c = ex.assemble(ex.run())
        exact = np.array_equal(c.indptr, ref.indptr) and np.array_equal(
            c.indices, ref.indices
        )
        emit({"ab": "kgrid", "config": name, "k": k,
              "t": round(t, 5), "build_s": round(build_s, 2),
              "rows_pad": ex.rows_pad, "sort_pad": ex.sort_pad,
              "widths": list(ex.widths), "pads": list(ex.pads),
              "slots": ex.sort_pad * ex.n_chunks,
              "bit_exact": bool(exact),
              "roofline_fraction": sort_fraction(ex, t)})
