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

# Pinned scipy baseline: fastest csr_matmat observed on this host class for
# this exact config (round 1, 2026-08-18).  The live baseline re-measures every
# run and swings ~2x with host load (r01 0.339 s -> r02 0.632 s), which
# inflated r02's vs_baseline without any TPU progress — ``vs_pinned`` divides
# by this constant so round-over-round comparisons track the TPU time only.
SCIPY_PINNED_S = 0.339


def main() -> None:
    import jax

    # Persistent XLA compilation cache: kernel compiles via the remote-compile
    # tunnel run minutes; cache them across processes.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from binary_spgemm_tpu import BCSR
    from binary_spgemm_tpu.ops.ell import auto_executor
    from binary_spgemm_tpu.ops.spgemm import spgemm_flops

    # Acquire the device FIRST with bounded retries: the axon service has
    # measured multi-hour outages during which backend init blocks ~10 min
    # then raises UNAVAILABLE — retry a few times (the outage may end
    # mid-round) and fail loudly rather than crash deep in the benchmark.
    dev = None
    # 8 attempts x (up to ~10 min blocking init + 3 min sleep) — worst case
    # ~100 min before giving up: outages have ended mid-round before, and a
    # late benchmark beats no benchmark
    attempts = 8
    for attempt in range(attempts):
        try:
            dev = jax.devices()[0]
            break
        except Exception as e:  # noqa: BLE001 — init raises RuntimeError
            print(
                f"device init attempt {attempt + 1}/{attempts} failed: {e}",
                file=sys.stderr,
            )
            if attempt == attempts - 1:
                raise
            try:
                import jax.extend.backend as _jeb

                _jeb.clear_backends()
            except Exception:
                pass
            time.sleep(180)

    # In-run dispatch+sync floor (null kernel, same protocol as the engine
    # timing below): the ~27 ms tunnel floor drifts ±10% between windows and
    # is half the headline number at 64k, so the JSON reports device_s =
    # fastest - floor_s measured THIS run (VERDICT r03 ask #5).
    from binary_spgemm_tpu.utils.trace import measure_dispatch_floor

    floor_s = measure_dispatch_floor()

    # On-chip Pallas bitonic self-check: the packed 2-D sorts route through
    # ops/bitonic.py on TPU; re-verify sort_rows ≡ lax.sort on one eligible
    # shape every round so a pltpu.roll semantics change in a future libtpu
    # can't silently corrupt packed sorts (ADVICE r03).
    pallas_sort_ok = None
    if dev.platform != "cpu":
        from binary_spgemm_tpu.ops.bitonic import bitonic_sort_rows, eligible

        if eligible(128, 4096):
            rng = np.random.default_rng(3)
            xs = rng.integers(0, 1 << 30, (128, 4096), dtype=np.int32)
            got = np.asarray(bitonic_sort_rows(jax.numpy.asarray(xs)))
            pallas_sort_ok = bool(np.array_equal(got, np.sort(xs, axis=1)))
            assert pallas_sort_ok, "Pallas bitonic sort diverged from np.sort"

    a = BCSR.random(N, N, D, seed=SEED)
    flops = spgemm_flops(a, a)

    # Stage operands in device memory (≡ reference: matrix in RAM before
    # timing); auto_executor picks the sliced-ELL engine here (the row-gather
    # expansion is ~6x cheaper than ESC's element gather on TPU).
    ex = auto_executor(a, a)

    # Warmup (compile) + correctness gate vs scipy
    out = ex.run()
    jax.block_until_ready(out)
    c = ex.assemble(out)
    nnz_c = c.nnz
    ref = a.to_scipy() @ a.to_scipy()
    ref.sort_indices()
    exact = np.array_equal(c.indptr, ref.indptr) and np.array_equal(
        c.indices, ref.indices
    )

    def sync():
        # force a real device round-trip (block_until_ready alone can return
        # early through the axon tunnel); out[-1] is the per-chunk nnz array
        np.asarray(out[-1])

    times = []
    for _ in range(TIMES):
        t0 = time.perf_counter()
        out = ex.run()
        sync()
        times.append(time.perf_counter() - t0)
    fastest = min(times)

    # ONE-SORT contract (run_padded): the compacted two-sort pipeline is
    # the product default, but consumers that tolerate a padded pull (PCIe
    # hosts, device-resident composition) get ~half the device time — report
    # it so the contract-level capability is tracked per round.  Gated
    # bit-exact through assemble_padded.
    one_sort_s = one_sort_exact = None
    if getattr(ex, "batched", False):
        pout = ex.run_padded()
        np.asarray(pout[-1])
        pts = []
        for _ in range(TIMES):
            t0 = time.perf_counter()
            pout = ex.run_padded()
            np.asarray(pout[-1])
            pts.append(time.perf_counter() - t0)
        one_sort_s = min(pts)
        cp = ex.assemble_padded(pout)
        one_sort_exact = bool(
            np.array_equal(cp.indptr, ref.indptr)
            and np.array_equal(cp.indices, ref.indices)
        )

    # Serial C-class baseline on this host (scipy csr_matmat, single thread)
    sp_a = a.to_scipy()
    sp_times = []
    for _ in range(6):  # first reps pay allocator/page-fault warmup; min converges
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
                "vs_pinned": round(SCIPY_PINNED_S / fastest, 3),
                "scipy_pinned_s": SCIPY_PINNED_S,
                "bit_exact_vs_scipy": bool(exact),
                "platform": dev.platform,
                "n": N,
                "d": D,
                "input_nnz": a.nnz,
                "output_nnz": nnz_c,
                "flops": flops,
                "tpu_fastest_s": round(fastest, 6),
                "tpu_mean_s": round(sum(times) / len(times), 6),
                # floor_s: in-run null-kernel dispatch+sync floor; device_s:
                # the floor-subtracted kernel time — the number that can
                # move when the kernel does (the e2e headline is half
                # dispatch floor at this size)
                "floor_s": round(floor_s, 6),
                "device_s": round(max(fastest - floor_s, 0.0), 6),
                # one-sort contract (run_padded): device time for padded-
                # pull consumers (PCIe hosts / device-resident composition)
                "one_sort_device_s": (
                    round(max(one_sort_s - floor_s, 0.0), 6)
                    if one_sort_s is not None else None
                ),
                "one_sort_bit_exact": one_sort_exact,
                "pallas_sort_device_ok": pallas_sort_ok,
                "scipy_fastest_s": round(sp_fastest, 6),
                "scipy_mean_s": round(sum(sp_times) / len(sp_times), 6),
            }
        )
    )


if __name__ == "__main__":
    main()
