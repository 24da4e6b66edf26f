"""Stage decomposition of the BATCHED 2-D engine on the perf-target configs
(hypersparse-5m-d2, large-1m-d8): expansion-only vs expansion+sort1 vs the
full kernel, on the executor's real staged arrays — pins down where the
0.133 s / 0.208 s go so the planner optimises the right term.

Run on the attached TPU: `python benchmarks/decompose_batched.py [--config X]`.
Appends to benchmarks/results.jsonl with ab="batched-decompose".
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops import ell as ell_mod
from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor, _unpack_tables, _unpack_entries, _expand_class_2d
from binary_spgemm_tpu.ops.spgemm import sort_compress_seps_2d, INT

CONFIGS = {
    "hypersparse-5m-d2": dict(n=5_000_000, d=2.0, seed=11),
    "large-1m-d8": dict(n=1_000_000, d=8.0, seed=7),
}


def expansion(tables_flat, er_all, ep_all, row0, *, table_shapes, n_chunks,
              rows_pad, n_cols, widths, pads, sort_pad):
    tables = _unpack_tables(tables_flat, table_shapes)
    ep_spans = tuple(
        p * w if shape is None else p
        for shape, w, p in zip(table_shapes, widths, pads)
    )
    er, ep = _unpack_entries(er_all, ep_all, row0, n_chunks, pads, ep_spans)
    k = n_chunks
    parts_r, parts_c = [], []
    for t, er_c, ep_c, w in zip(tables, er, ep, widths):
        r, c = _expand_class_2d(t, er_c, ep_c, rows_pad, n_cols, w)
        parts_r.append(r)
        parts_c.append(c)
    parts_r.append(jnp.broadcast_to(
        jnp.arange(rows_pad, dtype=INT)[None, :], (k, rows_pad)))
    parts_c.append(jnp.full((k, rows_pad), n_cols, INT))
    total = sum(p * w for p, w in zip(pads, widths)) + rows_pad
    fill = sort_pad - total
    if fill:
        parts_r.append(jnp.full((k, fill), rows_pad, INT))
        parts_c.append(jnp.full((k, fill), n_cols, INT))
    row = jnp.concatenate(parts_r, axis=1)
    col = jnp.concatenate(parts_c, axis=1)
    return row, col


STATIC = ("table_shapes", "n_chunks", "rows_pad", "n_cols", "widths", "pads",
          "sort_pad")


@functools.partial(jax.jit, static_argnames=STATIC)
def expansion_only(*args, **kw):
    row, col = expansion(*args, **kw)
    # cheap reduction forces materialisation without a sort
    return jnp.sum(col, axis=1, dtype=jnp.int32), jnp.sum(row, axis=1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=STATIC)
def expansion_sort1(*args, **kw):
    row, col = expansion(*args, **kw)
    shift = int(kw["n_cols"]).bit_length()
    key = (row << shift) | col
    key_s = jax.lax.sort(key, dimension=1, is_stable=False)
    return jnp.sum(key_s[:, :1], axis=1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=STATIC)
def full_kernel(*args, **kw):
    row, col = expansion(*args, **kw)
    return sort_compress_seps_2d(row, col, kw["rows_pad"], kw["n_cols"])


def bench(fn, args, kw, n=5):
    out = fn(*args, **kw)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    args_ns = ap.parse_args()
    names = [args_ns.config] if args_ns.config else list(CONFIGS)
    out_recs = []
    for name in names:
        cfg = CONFIGS[name]
        print(f"== {name}: generating", flush=True)
        a = BCSR.random(cfg["n"], cfg["n"], cfg["d"], seed=cfg["seed"])
        t0 = time.perf_counter()
        ex = EllSpGEMMExecutor(a, a, batched=True)
        build_s = time.perf_counter() - t0
        kw = ex._flat_kw()
        call = (ex.tables_flat, ex.er_all, ex.ep_all, 0)
        rec = {"ab": "batched-decompose", "config": name,
               "chunks": ex.n_chunks, "rows_pad": ex.rows_pad,
               "sort_pad": ex.sort_pad, "widths": list(ex.widths),
               "pads": list(ex.pads), "build_s": round(build_s, 3)}
        for label, fn in (("expansion", expansion_only),
                          ("expansion+sort1", expansion_sort1),
                          ("full", full_kernel)):
            t = bench(fn, call, kw)
            rec[label] = round(t, 5)
            print(f"  {label}: {t:.4f}s", flush=True)
        rec["bit_exact"] = "n/a"  # stage probes: truncated kernels
        out_recs.append(rec)
        print(json.dumps(rec), flush=True)
    from _provenance import emit
    for rec in out_recs:
        emit(rec)


if __name__ == "__main__":
    main()
