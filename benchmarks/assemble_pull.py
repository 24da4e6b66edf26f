"""Measure padded vs compact-before-pull assembly transfer (real device).

One-shot results must cross the device->host link; on slow links (this
environment's tunnel runs ~10-25 MB/s) the padded pull dominates end-to-end
latency.  This script builds a skewed product (R-MAT pads the stacked chunk
stream heavily), runs the multiply once, then times

  1. the straight padded pull of the stacked [C, out_pad] index array, and
  2. compact_chunks (device gather packing valid prefixes) + pull_prefix
     (fixed-page dynamic_slice pulls of only the combined prefix),

and checks the compact stream matches the padded prefixes bit-exactly.

Recorded (v5e through the ~25 MB/s tunnel, s=16 ef=8):
  padded [52, 4194304] = 872 MB at 3.25x padding, 33.0 s
  compact pull: 269 MB valid, 13.1 s  (2.5x)

Usage: python benchmarks/assemble_pull.py [--scale 16] [--ef 8]
"""
from __future__ import annotations

import argparse
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import binary_spgemm_tpu as bst  # noqa: E402
import binary_spgemm_tpu.ops.spgemm as sp  # noqa: E402
from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=16, help="R-MAT scale (n=2^s)")
    ap.add_argument("--ef", type=float, default=8.0, help="edge factor (nnz/row)")
    args = ap.parse_args()

    a = bst.BCSR.rmat(args.scale, args.ef, seed=5)
    ex = EllSpGEMMExecutor(a, a)
    idx_dev, nnz_dev = ex.run()
    nnz = np.asarray(nnz_dev)
    K, P = idx_dev.shape
    valid = nnz.astype(np.int64)
    valid[ex.n_chunks :] = 0
    total = int(valid.sum())
    print(
        f"padded [K={K}, P={P}] = {K * P * 4 / 1e6:.0f} MB, "
        f"valid = {total * 4 / 1e6:.0f} MB, ratio {K * P / total:.2f}"
    )

    # warm the compact kernels so the timing below excludes compiles
    flat = sp.compact_chunks(idx_dev, np.asarray(valid, np.int32))
    np.asarray(flat[:8])

    t0 = time.time()
    host_padded = np.asarray(idx_dev)
    t_pad = time.time() - t0
    print(f"padded pull:  {t_pad:6.1f} s ({K * P * 4 / 1e6 / t_pad:.1f} MB/s)")

    t0 = time.time()
    flat = sp.compact_chunks(idx_dev, np.asarray(valid, np.int32))
    host_c = sp.pull_prefix(flat, total)
    t_c = time.time() - t0
    print(
        f"compact pull: {t_c:6.1f} s "
        f"({total * 4 / 1e6 / t_c:.1f} MB/s effective, {t_pad / t_c:.2f}x)"
    )

    cuts = np.concatenate([[0], np.cumsum(valid)])
    for i in (0, ex.n_chunks // 2, ex.n_chunks - 1):
        assert np.array_equal(
            host_c[cuts[i] : cuts[i + 1]], host_padded[i, : valid[i]]
        ), i
    print("compact stream matches padded prefixes")


if __name__ == "__main__":
    main()
