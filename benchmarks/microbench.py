"""Primitive-level TPU microbenchmarks for the ESC engine's cost model.

Times the building blocks the engine is assembled from — elementwise random
gather, windowed (slice) gather, 1/2/3-array sorts, scans, unique-position
scatters — at the headline benchmark's padded sizes (E = 2^24 slots,
T = 2^20 table).  The results drive engine design decisions (see
ARCHITECTURE.md "Measured cost structure"): XLA TPU has no fast arbitrary
gather, so the question is which reformulations (windowed gathers, sort-joins,
forward-fills) pay for themselves.

Appends one JSON line per primitive to benchmarks/micro.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, default=1 << 24)
    ap.add_argument("--t", type=int, default=1 << 20)
    ap.add_argument("--times", type=int, default=3)
    ap.add_argument(
        "--out", default=os.path.join(os.path.dirname(__file__), "micro.jsonl")
    )
    ap.add_argument("--only", default=None, help="comma-separated case filter")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # honour the env var even though the image's sitecustomize
        # pre-registers the TPU backend (whose init hangs when the service
        # is unreachable) — lets new cases smoke-test on CPU
        jax.config.update("jax_platforms", "cpu")
    # the packed-gather cases need real int64 arrays; without x64 jnp.asarray
    # silently downcasts the table to int32 and the experiment measures
    # nothing (every other case pins int32 explicitly, unaffected)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from binary_spgemm_tpu.ops.spgemm import _forward_fill_last

    E, T = args.e, args.t
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

    table = jnp.asarray(rng.integers(0, T, T, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, T, E, dtype=np.int32))
    W = 16
    starts = jnp.asarray(rng.integers(0, T - W, E // W, dtype=np.int32))
    k1 = jnp.asarray(rng.integers(0, 1 << 30, E, dtype=np.int32))
    k2 = jnp.asarray(rng.integers(0, 1 << 30, E, dtype=np.int32))
    k3 = jnp.asarray(rng.integers(0, 1 << 30, E, dtype=np.int32))
    mask = jnp.asarray(rng.random(E) < 0.0625)
    pos = jnp.asarray(
        np.sort(rng.choice(E, size=T, replace=False)).astype(np.int32)
    )
    vals = jnp.asarray(rng.integers(0, 1 << 30, T, dtype=np.int32))

    table2d_16 = jnp.asarray(
        rng.integers(0, T, (1 << 16, 16), dtype=np.int32)
    )
    rowidx_16 = jnp.asarray(rng.integers(0, 1 << 16, E // 16, dtype=np.int32))
    table2d_8 = jnp.asarray(rng.integers(0, T, (1 << 17, 8), dtype=np.int32))
    rowidx_8 = jnp.asarray(rng.integers(0, 1 << 17, E // 8, dtype=np.int32))
    # packed-pair experiment: same logical int32 row width (16) as
    # gather_rows_w16 but stored as 8 int64 lanes per row — decides whether
    # XLA's row-gather throughput is per logical element (packing ~halves the
    # expansion gather) or per 32-bit lane (int64 is lane-pair emulated: no
    # win).  ns_per_elem is normalised by logical int32 elements (E).
    table2d_8_i64 = jnp.asarray(
        rng.integers(0, 1 << 62, (1 << 16, 8), dtype=np.int64)
    )
    small_table = jnp.asarray(rng.integers(0, 1 << 14, 1 << 14, dtype=np.int32))
    idx_small = jnp.asarray(rng.integers(0, 1 << 14, E, dtype=np.int32))
    idx_sorted = jnp.asarray(np.sort(np.asarray(idx)))
    perm = jnp.asarray(rng.permutation(E).astype(np.int32))

    cases = {
        "gather_elem": (lambda: _g_elem(jnp, table, idx)),
        "gather_win16": (lambda: _g_win(jax, jnp, table, starts, W)),
        "gather_rows_w16": (lambda: _g_elem(jnp, table2d_16, rowidx_16)),
        "gather_rows_w8": (lambda: _g_elem(jnp, table2d_8, rowidx_8)),
        "gather_rows_w8_i64": (lambda: _g_elem(jnp, table2d_8_i64, rowidx_16)),
        "gather_rows_w8_i64_unpack": (
            lambda: _g_packed_unpack(jnp, table2d_8_i64, rowidx_16)
        ),
        "gather_small_table": (lambda: _g_elem(jnp, small_table, idx_small)),
        # NOTE: a hand-built rank-1 lax.gather with indices_are_sorted=True
        # SIGABRTs the v5e gather emitter (gather_emitter.cc:1543 CHECK,
        # operand_rank == 1 || ...); don't add a sorted-gather case.
        "scatter_perm": (lambda: _scatter_set(jnp, perm, k1, E)),
        "sort1": (lambda: _sort(jax, (k1,), 1)),
        "sort2key": (lambda: _sort(jax, (k1, k2), 2)),
        "sort1key1payload": (lambda: _sort(jax, (k1, k2), 1)),
        "sort1key2payload": (lambda: _sort(jax, (k1, k2, k3), 1)),
        # Batched minor-axis sorts at the same total element count: the cost
        # model for a per-row segmented-sort engine layout (each output row's
        # candidates sorted independently) and for batched chunk sorts.
        "sort_rows_w128": (lambda: _sort2d(jax, k1, 128)),
        "sort_rows_w512": (lambda: _sort2d(jax, k1, 512)),
        "sort_rows_w4096": (lambda: _sort2d(jax, k1, 4096)),
        "sort_rows_w512k": (lambda: _sort2d(jax, k1, 1 << 19)),
        "ffill": (lambda: _ffill(_forward_fill_last, k1, mask)),
        "cumsum": (lambda: _cumsum(jnp, k1)),
        "scatter_unique": (lambda: _scatter(jnp, pos, vals, E)),
    }
    only = set(args.only.split(",")) if args.only else None

    with open(args.out, "a") as f:
        for name, make in cases.items():
            if only and name not in only:
                continue
            fn = make()
            t0 = time.perf_counter()
            out = fn()
            np.asarray(jax.tree_util.tree_leaves(out)[0][:4])
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(args.times):
                t0 = time.perf_counter()
                out = fn()
                np.asarray(jax.tree_util.tree_leaves(out)[0][:4])
                ts.append(time.perf_counter() - t0)
            rec = {
                "case": name,
                "E": E,
                "T": T,
                "platform": dev.platform,
                "fastest_s": min(ts),
                "ns_per_elem": min(ts) / E * 1e9,
                "compile_or_cached_s": round(compile_s, 3),
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            line = json.dumps(rec)
            print(line, flush=True)
            f.write(line + "\n")
            f.flush()


def _g_elem(jnp, table, idx):
    f = __import__("jax").jit(lambda t, i: t[i])
    return lambda: f(table, idx)


def _g_packed_unpack(jnp, table, idx):
    jax = __import__("jax")

    def g(t, i):
        g64 = t[i]  # [r, w2] int64
        g32 = jax.lax.bitcast_convert_type(g64, jnp.int32)  # [r, w2, 2]
        return g32.reshape(g64.shape[0], -1)

    f = jax.jit(g)
    return lambda: f(table, idx)


def _g_win(jax, jnp, table, starts, w):
    def g(t, s):
        return jax.vmap(
            lambda st: jax.lax.dynamic_slice(t, (st,), (w,))
        )(s)

    f = jax.jit(g)
    return lambda: f(table, starts)


def _sort(jax, arrs, nkeys):
    f = jax.jit(
        lambda *a: jax.lax.sort(a, num_keys=nkeys, is_stable=False)
    )
    return lambda: f(*arrs)


def _sort2d(jax, flat, width):
    x = flat.reshape(-1, width)
    f = jax.jit(
        lambda v: jax.lax.sort((v,), dimension=1, is_stable=False)[0]
    )
    return lambda: f(x)


def _ffill(ffl, vals, mask):
    f = __import__("jax").jit(ffl)
    return lambda: f(vals, mask)


def _cumsum(jnp, x):
    f = __import__("jax").jit(lambda v: jnp.cumsum(v, dtype=jnp.int32))
    return lambda: f(x)


def _g_sorted(jax, table, idx_sorted):
    f = jax.jit(
        lambda t, i: jax.lax.gather(
            t[:, None],
            i[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(), collapsed_slice_dims=(0, 1),
                start_index_map=(0,),
            ),
            (1, 1),
            indices_are_sorted=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
    )
    return lambda: f(table, idx_sorted)


def _scatter_set(jnp, pos, vals, e):
    f = __import__("jax").jit(
        lambda p, v: jnp.zeros(e, jnp.int32).at[p].set(v, mode="drop")
    )
    return lambda: f(pos, vals)


def _scatter(jnp, pos, vals, e):
    f = __import__("jax").jit(
        lambda p, v: jnp.zeros(e, jnp.int32).at[p].add(v, mode="drop")
    )
    return lambda: f(pos, vals)


if __name__ == "__main__":
    main()
