"""A/B: the ONE-SORT formulation vs the production two-sort pipeline.

The production batched kernel runs pair-sort -> dedup-mark -> demote ->
COMPACTION SORT so only the valid prefix (``out_pad``) leaves the device.
The one-sort variant stops after the demote: the stream is already sorted
with int32-max holes, so the host can compact it — at the cost of pulling
the FULL ``[k, sort_pad]`` padded stream over the device->host link.

Round-3 claimed (unmeasured) that "<0.045 s at 64k needs a one-sort
formulation, which on THIS environment's slow result link loses more in
pull bytes than it saves" (VERDICT r03 ask #8).  This harness measures both
sides: DEVICE time (the number that matters on a PCIe-attached host) and
e2e including the pull + host compaction (the number that matters here).
Bit-exactness of the one-sort output is gated vs the scipy oracle.

Run: python benchmarks/ab_one_sort.py [--config mid-64k-d16]
Appends ab="one-sort" rows to results.jsonl.
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor, BATCHED_MAX_SLOTS
from binary_spgemm_tpu.ops.bitonic import sort_rows as sort_rows_1key
from binary_spgemm_tpu.ops.spgemm import INT
from binary_spgemm_tpu.utils.trace import measure_dispatch_floor
from decompose_batched import expansion, STATIC
from _provenance import emit

CONFIGS = {
    "mid-64k-d16": dict(n=1 << 16, d=16.0, seed=7),
    "mid-256k-d16": dict(n=1 << 18, d=16.0, seed=7),
    "hypersparse-5m-d2": dict(n=5_000_000, d=2.0, seed=7),
}


@functools.partial(jax.jit, static_argnames=STATIC)
def one_sort_kernel(*args, **kw):
    row, col = expansion(*args, **kw)
    shift = int(kw["n_cols"]).bit_length()
    key = (row << shift) | col
    limit = kw["rows_pad"] << shift
    key_s = sort_rows_1key(key)
    k = key_s.shape[0]
    prev = jnp.concatenate([jnp.full((k, 1), -1, INT), key_s[:, :-1]], axis=1)
    keep = (key_s != prev) & (key_s < limit)
    nnz = jnp.sum(keep, axis=1, dtype=INT)
    demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max)
    return demoted, nnz


def host_assemble_one_sort(ex, demoted, shift):
    """Compact the sorted-with-holes streams on the host and hand them to
    the executor's OWN separator-embedded assembler — same machinery as the
    production path, only the compaction moved from device to host."""
    sent = np.iinfo(np.int32).max
    mask = (1 << shift) - 1
    chunk_idx, valid = [], np.zeros(demoted.shape[0], np.int64)
    for ci in range(demoted.shape[0]):
        keys = demoted[ci]
        keys = keys[keys != sent]
        chunk_idx.append((keys & mask).astype(np.int32))
        valid[ci] = len(keys)
    valid[ex.n_chunks:] = 0
    return ex._assemble_seps_batch(chunk_idx, valid)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--times", type=int, default=5)
    args = ap.parse_args()
    names = [args.config] if args.config else list(CONFIGS)
    for name in names:
        cfg = CONFIGS[name]
        a = BCSR.random(cfg["n"], cfg["n"], cfg["d"], seed=cfg["seed"])
        ref = a.to_scipy() @ a.to_scipy()
        ref.sort_indices()
        floor = measure_dispatch_floor()
        ex = EllSpGEMMExecutor(
            a, a, batched=True, batched_slots_cap=BATCHED_MAX_SLOTS
        )
        kw = ex._flat_kw()
        call = (ex.tables_flat, ex.er_all, ex.ep_all, 0)
        shift = int(ex.n_cols).bit_length()

        # --- production two-sort: device + e2e(assemble) ---
        out = ex.run()
        np.asarray(out[-1])
        dts, ets = [], []
        for _ in range(args.times):
            t0 = time.perf_counter()
            out = ex.run()
            np.asarray(out[-1])
            dts.append(time.perf_counter() - t0)
        for _ in range(3):
            t0 = time.perf_counter()
            out = ex.run()
            c = ex.assemble(out)
            ets.append(time.perf_counter() - t0)
        exact2 = bool(
            np.array_equal(c.indptr, ref.indptr)
            and np.array_equal(c.indices, ref.indices)
        )
        emit({
            "ab": "one-sort", "config": name, "variant": "two-sort-prod",
            "k": ex.n_chunks, "sort_pad": ex.sort_pad,
            "out_pad": getattr(ex, "out_pad", None),
            "t_device_path_s": round(min(dts), 5),
            "device_s": round(min(dts) - floor, 5),
            "e2e_with_pull_s": round(min(ets), 5),
            "floor_s": round(floor, 6), "bit_exact": exact2,
        })
        assert exact2, name

        # --- one-sort: device + e2e(padded pull + host compact) ---
        dem, nnz = one_sort_kernel(*call, **kw)
        np.asarray(nnz)
        dts1, ets1 = [], []
        for _ in range(args.times):
            t0 = time.perf_counter()
            dem, nnz = one_sort_kernel(*call, **kw)
            np.asarray(nnz)
            dts1.append(time.perf_counter() - t0)
        for _ in range(3):
            t0 = time.perf_counter()
            dem, nnz = one_sort_kernel(*call, **kw)
            dem_h = np.asarray(dem)  # the FULL padded pull
            c1 = host_assemble_one_sort(ex, dem_h, shift)
            ets1.append(time.perf_counter() - t0)
        exact1 = bool(
            np.array_equal(c1.indptr, ref.indptr)
            and np.array_equal(c1.indices, ref.indices)
        )
        emit({
            "ab": "one-sort", "config": name, "variant": "one-sort",
            "k": ex.n_chunks, "sort_pad": ex.sort_pad,
            "pull_mb": round(dem.size * 4 / 1e6, 1),
            "t_device_path_s": round(min(dts1), 5),
            "device_s": round(min(dts1) - floor, 5),
            "e2e_with_pull_s": round(min(ets1), 5),
            "floor_s": round(floor, 6), "bit_exact": exact1,
        })
        assert exact1, name
        del ex, out, dem


if __name__ == "__main__":
    main()
