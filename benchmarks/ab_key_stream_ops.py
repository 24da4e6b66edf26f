"""Same-window A/B: keyed vs pair-stream assembly for the BATCHED masked
and fused-OR kernels (the plain-family win was measured in ab="key-stream";
the closing sweep hinted a fused-OR regression — 0.051 -> 0.0613 across
windows — so the family conversion gets its own measurement).

Run: python benchmarks/ab_key_stream_ops.py [--n 65536]
Appends ab="key-stream-ops" rows.
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
from binary_spgemm_tpu.ops.ell import (
    EllSpGEMMExecutor, _assemble_stream_2d, _staged_pairs_2d,
    _unpack_entries, _unpack_tables,
)
from binary_spgemm_tpu.ops.spgemm import (
    sort_compress_masked_seps_2d, sort_compress_seps_2d,
)
from binary_spgemm_tpu.utils.trace import measure_dispatch_floor
from _provenance import emit

STATIC = ("table_shapes", "n_chunks", "rows_pad", "n_cols", "widths", "pads",
          "sort_pad")


def _streams_pair(tables_flat, er_all, ep_all, *, table_shapes, n_chunks,
                  rows_pad, n_cols, widths, pads, sort_pad, extra=()):
    tables = _unpack_tables(tables_flat, table_shapes)
    ep_spans = tuple(
        p * w if shape is None else p
        for shape, w, p in zip(table_shapes, widths, pads)
    )
    er, ep = _unpack_entries(er_all, ep_all, 0, n_chunks, pads, ep_spans)
    return _assemble_stream_2d(
        tables, er, ep, n_chunks, rows_pad, n_cols, widths, pads, sort_pad,
        extra=extra,
    )


@functools.partial(jax.jit, static_argnames=STATIC)
def masked_pair_kernel(tables_flat, er_all, ep_all, f_ptr, f_idx, **kw):
    row, col = _streams_pair(tables_flat, er_all, ep_all, **kw)
    f_row, f_col = _staged_pairs_2d(
        f_ptr, f_idx, kw["rows_pad"], kw["n_cols"]
    )
    idx, nnz = sort_compress_masked_seps_2d(
        row, col, f_row, f_col, kw["rows_pad"], kw["n_cols"]
    )
    return idx[:, : f_idx.shape[-1] + kw["rows_pad"]], nnz


@functools.partial(jax.jit, static_argnames=STATIC)
def or_pair_kernel(tables_flat, er_all, ep_all, d_ptr, d_idx, **kw):
    d_rows, d_cols = _staged_pairs_2d(
        d_ptr, d_idx, kw["rows_pad"], kw["n_cols"]
    )
    row, col = _streams_pair(
        tables_flat, er_all, ep_all, extra=((d_rows, d_cols),), **kw
    )
    idx, nnz = sort_compress_seps_2d(row, col, kw["rows_pad"], kw["n_cols"])
    return idx, nnz


def bench(fn, times):
    out = fn()
    np.asarray(out[-1][:1])
    ts = []
    for _ in range(times):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[-1][:1])
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 16)
    ap.add_argument("--d", type=float, default=16.0)
    ap.add_argument("--times", type=int, default=5)
    args = ap.parse_args()
    n = args.n
    a = BCSR.random(n, n, args.d, seed=7)
    f = BCSR.random(n, n, args.d / 2, seed=8)
    dm = BCSR.random(n, n, args.d / 2, seed=9)
    ex = EllSpGEMMExecutor(a, a, masked=True, batched=True)
    assert ex.batched and ex.n_groups == 1
    fs = ex.stage_mask(f)
    ds = ex.stage_mask(dm)
    kw = ex._flat_kw()
    floor = measure_dispatch_floor()

    for op, key_fn, pair_fn, staged in (
        ("masked", lambda: ex.run_masked(fs),
         lambda: masked_pair_kernel(
             ex.tables_flat, ex.er_all, ex.ep_all, *fs, **kw), fs),
        ("fused-or", lambda: ex.run_or(ds),
         lambda: or_pair_kernel(
             ex.tables_flat, ex.er_all, ex.ep_all, *ds, **kw), ds),
    ):
        t_key, out_k = bench(key_fn, args.times)
        t_pair, out_p = bench(pair_fn, args.times)
        # production kernels may out_pad-truncate differently than the
        # local pair kernels — compare per-chunk VALID prefixes + nnz
        idx_k, nnz_k = np.asarray(out_k[0]), np.asarray(out_k[1])
        idx_p, nnz_p = np.asarray(out_p[0]), np.asarray(out_p[1])
        same = np.array_equal(nnz_k, nnz_p)
        if same:
            for c in range(idx_k.shape[0]):
                m = int(nnz_k[c])
                if not np.array_equal(idx_k[c, :m], idx_p[c, :m]):
                    same = False
                    break
        for variant, t in (("pair-stream", t_pair), ("key-stream", t_key)):
            emit({
                "ab": "key-stream-ops", "config": f"ops-{n>>10}k-d{args.d:g}",
                "op": op, "variant": variant, "k": ex.n_chunks,
                "sort_pad": ex.sort_pad, "t_device_path_s": round(t, 5),
                "device_s": round(t - floor, 5), "floor_s": round(floor, 6),
                "streams_equal": bool(same), "bit_exact": bool(same),
            })
        print(f"{op}: pair {t_pair:.5f}  key {t_key:.5f}  equal={same}",
              flush=True)


if __name__ == "__main__":
    main()
