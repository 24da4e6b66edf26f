"""Micro: 2-D sort + row-gather rates at SMALL row lengths.

The batched engine's sort cost model (ops/ell.py::_sort_rate_ns) is pinned
by measurements down to L=4096 only; the hypersparse regime wants chunks
as short as the per-row candidate count (L = 8..640).  Bitonic work/elem
scales with log2(L)*(log2(L)+1)/2, so if XLA realises that scaling, tiny-L
sorts should run several times faster per element than the L~=640 chunks
the batched planner currently picks.  Also measures the 2-D row-gather
(expansion) rate at hypersparse shapes.  Appends to benchmarks/micro.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

dev = jax.devices()[0]
print("device:", dev, flush=True)
rng = np.random.default_rng(0)


def bench(fn, args, n=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])
        ts.append(time.perf_counter() - t0)
    return min(ts)


@jax.jit
def sort1(x):
    return jax.lax.sort(x, dimension=1, is_stable=False)


@jax.jit
def sort_dedup_sort(x):
    # the full compress pipeline: sort, neighbour-dedup, demote, re-sort
    k = x.shape[0]
    s = jax.lax.sort(x, dimension=1, is_stable=False)
    prev = jnp.concatenate([jnp.full((k, 1), -1, jnp.int32), s[:, :-1]], axis=1)
    keep = s != prev
    nnz = jnp.sum(keep, axis=1, dtype=jnp.int32)
    demoted = jnp.where(keep, s, jnp.iinfo(jnp.int32).max)
    return jax.lax.sort(demoted, dimension=1, is_stable=False), nnz


@jax.jit
def rowgather(tbl, rows):
    return tbl[rows]


results = []
TOTAL = 1 << 25
for L in (8, 32, 128, 512):
    k = TOTAL // L
    x = jnp.asarray(rng.integers(0, 1 << 30, size=(k, L), dtype=np.int32))
    t = bench(sort1, (x,))
    rec = {
        "bench": "sort_small", "kind": "1key", "k": k, "L": L,
        "ns_per_elem": t * 1e9 / TOTAL, "s": t,
    }
    print(json.dumps(rec), flush=True)
    results.append(rec)
    t = bench(sort_dedup_sort, (x,))
    rec = {
        "bench": "sort_small", "kind": "sds", "k": k, "L": L,
        "ns_per_elem": t * 1e9 / TOTAL, "s": t,
    }
    print(json.dumps(rec), flush=True)
    results.append(rec)

# 2-D row gather at hypersparse shapes: table [nB, W] int32, R random rows
for nB, W, R in ((1 << 22, 8, 1 << 22), (1 << 22, 16, 1 << 21),
                 (1 << 20, 128, 1 << 18)):
    tbl = jnp.asarray(rng.integers(0, 1 << 22, size=(nB, W), dtype=np.int32))
    rows = jnp.asarray(rng.integers(0, nB, size=(R,), dtype=np.int32))
    t = bench(rowgather, (tbl, rows))
    rec = {
        "bench": "rowgather_small", "nB": nB, "W": W, "R": R,
        "ns_per_elem": t * 1e9 / (R * W), "s": t,
    }
    print(json.dumps(rec), flush=True)
    results.append(rec)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "micro.jsonl"), "a") as f:
    for rec in results:
        f.write(json.dumps(rec) + "\n")
