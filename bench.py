"""Headline benchmark: boolean SpGEMM C = A·A throughput on one TPU chip.

Protocol mirrors the reference CLI (final/SpGEMM_mpi_omp.c:294-344): generate a
random pattern matrix (the reference's benchmark inputs are sprand patterns,
Matlab/write_spm.m), time `times` barrier-synced repeats of C = A·A with the
matrix already resident (in HBM here, in RAM there), report the fastest.

Baseline for `vs_baseline`: scipy.sparse's CSR matmul on this same host — an
independent, optimised serial C++ Gustavson implementation, i.e. the same
algorithm/class of implementation as the reference's serial kernel
(SpGEMM_bigslice).  vs_baseline = scipy_time / tpu_time (higher is better).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# Benchmark config (≈ BASELINE.json config 2: random n=64K, d=16 nnz/row)
N = 1 << 16
D = 16.0
TIMES = 5
SEED = 2026


def main() -> None:
    import jax
    import jax.numpy as jnp

    from binary_spgemm_tpu import BCSR
    from binary_spgemm_tpu.formats.bcsr import INDEX_DTYPE
    from binary_spgemm_tpu.ops.spgemm import (
        pad_bucket, spgemm_flops, spgemm_padded,
    )

    a = BCSR.random(N, N, D, seed=SEED)
    flops = spgemm_flops(a, a)

    # Stage operands in device memory (≡ reference: matrix in RAM before timing)
    nnz_pad = pad_bucket(a.nnz)
    idx = np.zeros(nnz_pad, INDEX_DTYPE)
    idx[: a.nnz] = a.indices
    dev = jax.devices()[0]
    a_ptr = jax.device_put(jnp.asarray(a.indptr), dev)
    a_idx = jax.device_put(jnp.asarray(idx), dev)
    a_nnz = jax.device_put(jnp.asarray(a.nnz, jnp.int32), dev)
    b_idx = jax.device_put(jnp.asarray(a.indices), dev)
    flops_pad = pad_bucket(flops)

    def run():
        return spgemm_padded(
            a_ptr, a_idx, a_nnz, a_ptr, b_idx, n_cols=N, flops_pad=flops_pad
        )

    # Warmup (compile) + correctness gate vs scipy
    c_ptr, c_idx, nnz_c = run()
    jax.block_until_ready(c_ptr)
    nnz_c = int(nnz_c)
    ref = a.to_scipy() @ a.to_scipy()
    ref.sort_indices()
    exact = np.array_equal(np.asarray(c_ptr), ref.indptr) and np.array_equal(
        np.asarray(c_idx[:nnz_c]), ref.indices
    )

    times = []
    for _ in range(TIMES):
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    fastest = min(times)

    # Serial C-class baseline on this host (scipy csr_matmat, single thread)
    sp_a = a.to_scipy()
    sp_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        c = sp_a @ sp_a
        sp_times.append(time.perf_counter() - t0)
    sp_fastest = min(sp_times)

    out_nnz_per_s = nnz_c / fastest
    print(
        json.dumps(
            {
                "metric": "output_nnz_per_s",
                "value": round(out_nnz_per_s, 1),
                "unit": "nnz/s",
                "vs_baseline": round(sp_fastest / fastest, 3),
                "bit_exact_vs_scipy": bool(exact),
                "platform": dev.platform,
                "n": N,
                "d": D,
                "input_nnz": a.nnz,
                "output_nnz": nnz_c,
                "flops": flops,
                "tpu_fastest_s": round(fastest, 6),
                "tpu_mean_s": round(sum(times) / len(times), 6),
                "scipy_fastest_s": round(sp_fastest, 6),
            }
        )
    )


if __name__ == "__main__":
    main()
