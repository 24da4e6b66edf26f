"""A/B: unrolled 1-D chunk sorts (current run()) vs batched 2-D engine
at several dealt-k, on the real chip.  Appends to benchmarks/results.jsonl."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _provenance import emit, sort_fraction

CONFIGS = [
    ("mid-64k-d16", 1 << 16, 16.0, [512, 2048]),
    ("large-1m-d8", 1 << 20, 8.0, [2048, 8192]),
    ("hypersparse-5m-d2", 5_000_000, 2.0, [8192, 32768]),
]

def timed(ex, n=3):
    out = ex.run()
    np.asarray(out[-1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = ex.run()
        np.asarray(out[-1])
        ts.append(time.perf_counter() - t0)
    return min(ts), out

def real_nnz(ex, out):
    nnz = np.asarray(out[-1], np.int64)[: ex.n_chunks]
    return int(nnz.sum()) - ex.n_chunks * ex.rows_pad

for name, n, d, ks in CONFIGS:
    a = BCSR.random(n, n, d, seed=7)
    ref = a.to_scipy() @ a.to_scipy()
    ref.sort_indices()

    def bit_exact(ex, out):
        c = ex.assemble(out)
        return bool(
            np.array_equal(c.indptr, ref.indptr)
            and np.array_equal(c.indices, ref.indices)
        )

    base = EllSpGEMMExecutor(a, a)
    tb, out_b = timed(base)
    nnz_ref = real_nnz(base, out_b)
    rec = {"ab": "batched2d", "config": name, "variant": "base",
           "t": tb, "chunks": base.n_chunks, "rows_pad": base.rows_pad,
           "sort_pad": base.sort_pad, "total_slots": base.total_slots,
           "real_nnz": nnz_ref, "bit_exact": bit_exact(base, out_b),
           "roofline_fraction": sort_fraction(base, tb)}
    emit(rec)
    del base, out_b
    for k in ks:
        try:
            ex = EllSpGEMMExecutor(a, a, deal_k=k, batched=True)
        except OverflowError as e:
            emit({"ab": "batched2d", "config": name,
                  "variant": f"k{k}", "error": str(e)})
            continue
        t, out = timed(ex)
        nz = real_nnz(ex, out)
        rec = {"ab": "batched2d", "config": name, "variant": f"k{k}",
               "t": t, "chunks": ex.n_chunks, "rows_pad": ex.rows_pad,
               "sort_pad": ex.sort_pad, "total_slots": ex.total_slots,
               "real_nnz": nz, "nnz_match": nz == nnz_ref,
               "bit_exact": bit_exact(ex, out),
               "speedup_vs_base": tb / t,
               "roofline_fraction": sort_fraction(ex, t)}
        emit(rec)
        del ex, out
