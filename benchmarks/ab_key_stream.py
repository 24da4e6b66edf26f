"""A/B: direct packed-KEY stream assembly vs the pair-stream + pack pass.

The batched kernel's candidate stream used to be assembled as TWO
``[k, sort_pad]`` int32 arrays (rows, cols) that a separate full-stream
fusion packed into sort keys (``(row << shift) | col``) — profiled at
hypersparse as a shift-or pass + doubled concat traffic.  The key-stream
form (`ops/ell.py::_assemble_stream_2d(shift=...)`) emits the packed keys
directly per class piece: ONE stream array, no pack pass, element-identical
keys (bit-exact by construction, and gated here vs the scipy oracle).

Run: python benchmarks/ab_key_stream.py [--config mid-256k-d16]
Appends ab="key-stream" rows to results.jsonl.
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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops.ell import (
    EllSpGEMMExecutor, BATCHED_MAX_SLOTS, _assemble_stream_2d,
    _unpack_tables, _unpack_entries,
)
from binary_spgemm_tpu.ops.spgemm import (
    sort_compress_seps_2d, sort_compress_seps_2d_keys,
)
from binary_spgemm_tpu.utils.trace import measure_dispatch_floor
from _provenance import emit

CONFIGS = {
    "mid-64k-d16": dict(n=1 << 16, d=16.0, seed=7),
    "mid-256k-d16": dict(n=1 << 18, d=16.0, seed=7),
    "large-1m-d8": dict(n=1 << 20, d=8.0, seed=7),
    "hypersparse-5m-d2": dict(n=5_000_000, d=2.0, seed=7),
}

STATIC = ("table_shapes", "n_chunks", "rows_pad", "n_cols", "widths", "pads",
          "sort_pad")


def _streams(tables_flat, er_all, ep_all, row0, *, shift, table_shapes,
             n_chunks, rows_pad, n_cols, widths, pads, sort_pad):
    tables = _unpack_tables(tables_flat, table_shapes)
    ep_spans = tuple(
        p * w if shape is None else p
        for shape, w, p in zip(table_shapes, widths, pads)
    )
    er, ep = _unpack_entries(er_all, ep_all, row0, n_chunks, pads, ep_spans)
    return _assemble_stream_2d(
        tables, er, ep, n_chunks, rows_pad, n_cols, widths, pads, sort_pad,
        shift=shift,
    )


@functools.partial(jax.jit, static_argnames=STATIC)
def pair_kernel(*args, **kw):
    row, col = _streams(*args, shift=None, **kw)
    return sort_compress_seps_2d(row, col, kw["rows_pad"], kw["n_cols"])


@functools.partial(jax.jit, static_argnames=STATIC)
def key_kernel(*args, **kw):
    shift = int(kw["n_cols"]).bit_length()
    key = _streams(*args, shift=shift, **kw)
    return sort_compress_seps_2d_keys(key, kw["rows_pad"], kw["n_cols"])


def bench(fn, call, kw, times):
    idx, nnz = fn(*call, **kw)
    np.asarray(nnz)
    ts = []
    for _ in range(times):
        t0 = time.perf_counter()
        idx, nnz = fn(*call, **kw)
        np.asarray(nnz)
        ts.append(time.perf_counter() - t0)
    return min(ts), idx, nnz


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
        ex = EllSpGEMMExecutor(
            a, a, batched=True, batched_slots_cap=BATCHED_MAX_SLOTS
        )
        kw = dict(ex._flat_kw())
        kw.pop("out_pad", None)
        call = (ex.tables_flat, ex.er_all, ex.ep_all, 0)
        floor = measure_dispatch_floor()

        t_pair, idx_p, nnz_p = bench(pair_kernel, call, kw, args.times)
        t_key, idx_k, nnz_k = bench(key_kernel, call, kw, args.times)
        same = bool(
            np.array_equal(np.asarray(nnz_p), np.asarray(nnz_k))
            and np.array_equal(np.asarray(idx_p), np.asarray(idx_k))
        )
        c = ex.assemble((np.asarray(idx_k)[:, : ex.out_pad],
                         np.asarray(nnz_k)))
        exact = bool(
            np.array_equal(c.indptr, ref.indptr)
            and np.array_equal(c.indices, ref.indices)
        )
        for variant, t in (("pair-stream", t_pair), ("key-stream", t_key)):
            emit({
                "ab": "key-stream", "config": name, "variant": variant,
                "k": ex.n_chunks, "sort_pad": ex.sort_pad,
                "t_device_path_s": round(t, 5),
                "device_s": round(t - floor, 5),
                "floor_s": round(floor, 6),
                "streams_equal": same, "bit_exact": exact,
            })
        print(f"{name}: pair {t_pair:.5f}  key {t_key:.5f}  "
              f"device {t_pair - floor:.5f} -> {t_key - floor:.5f}  "
              f"equal={same} exact={exact}", flush=True)
        assert same and exact, name
        del ex, idx_p, idx_k


if __name__ == "__main__":
    main()
