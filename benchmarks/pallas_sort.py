"""Pallas prototype: VMEM-resident bitonic row sort for the 2-D sort path.

Round-2 verdict ask #3, second candidate (the expansion-gather candidate was
measured and rejected — results.jsonl ab="pallas-gather", ROADMAP).  The
batched 2-D ELL engine's device time is sort-dominated: every chunk rides one
``[k, L]`` array and ``jax.lax.sort(dimension=1)`` runs twice per multiply
(pair sort + compaction sort).  XLA's measured rates (micro.jsonl
"sort_rate27"): 0.23 ns/elem at L=128 up to 0.85 at L=65536.  The pencil
bitonic model (ROADMAP "Sub-XLA sort kernel") put XLA at ~85% of a
same-algorithm VPU bitonic, leaving <15% — but that model was never
*measured*.  This harness measures it:

  xla     — ``jax.lax.sort(x, dimension=1)`` (the production primitive)
  pallas  — a VMEM-resident bitonic network: each grid step sorts a
            ``[B, L]`` row block entirely in VMEM; compare-exchange partners
            come from two ``pltpu.roll`` lane/sublane rotations per stage
            (Mosaic has no arbitrary cross-lane gather — fixed-stride
            rotation is the one shuffle it does have), and the
            direction/partner masks are iota-derived constants the compiler
            folds per stage.

Rows are sorted ascending, independently — exactly the production
``sort_compress_*_2d`` contract (sentinels already sort last there, so a
plain ascending sort is the right A/B).  Win → integrate behind an executor
flag; loss or compile-reject → recorded here + ROADMAP, closing the ask with
a measured number either way.

Usage:
  python benchmarks/pallas_sort.py --check      # interpret-mode correctness (CPU)
  python benchmarks/pallas_sort.py              # TPU A/B, appends results.jsonl
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SHAPES = [(8192, 2048), (65536, 2048), (16384, 8192)]


def _stages(L: int):
    """Bitonic network stage list for length L (power of two)."""
    out = []
    kk = 2
    while kk <= L:
        j = kk // 2
        while j >= 1:
            out.append((kk, j))
            j //= 2
        kk *= 2
    return out


def make_bitonic(L: int, B: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stages = _stages(L)

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        # lane-index masks are iota-derived with static j/kk — Mosaic folds
        # them to constants per stage:
        #   is_lo[i]    = (i & j) == 0          (partner is at i+j, else i-j)
        #   take_min[i] = is_lo[i] == ((i & kk) == 0)   (ascending block keeps
        #                 the smaller value at the lo position)
        i = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        for kk, j in stages:
            is_lo = (i & j) == 0
            take_min = is_lo == ((i & kk) == 0)
            if interpret:
                pj = jnp.roll(x, -j, axis=1)
                mj = jnp.roll(x, j, axis=1)
            else:
                pj = pltpu.roll(x, -j % L, axis=1)
                mj = pltpu.roll(x, j, axis=1)
            partner = jnp.where(is_lo, pj, mj)
            x = jnp.where(
                take_min, jnp.minimum(x, partner), jnp.maximum(x, partner)
            )
        o_ref[...] = x

    @jax.jit
    def sort_rows(x):
        k = x.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(k // B,),
            in_specs=[
                pl.BlockSpec((B, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (B, L), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=interpret,
        )(x)

    return sort_rows


def check() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for k, L, B in [(16, 256, 8), (8, 1024, 4)]:
        x = rng.integers(0, 1 << 30, (k, L), dtype=np.int32)
        f = make_bitonic(L, B, interpret=True)
        got = np.asarray(f(jnp.asarray(x)))
        want = np.sort(x, axis=1)
        assert np.array_equal(got, want), (k, L)
        print(f"interpret ok [{k}, {L}]")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--times", type=int, default=5)
    ap.add_argument("--block", type=int, default=128)
    args = ap.parse_args()
    if args.check:
        check()
        return

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from _provenance import emit

    rng = np.random.default_rng(1)
    for k, L in SHAPES:
        x = rng.integers(0, 1 << 30, (k, L), dtype=np.int32)
        xd = jnp.asarray(x)
        want = np.sort(x, axis=1)

        xla_sort = jax.jit(lambda v: jax.lax.sort(v, dimension=1))
        variants = [("xla", xla_sort)]
        try:
            variants.append(("pallas", make_bitonic(L, args.block)))
        except Exception as e:  # construction failure
            emit({"ab": "pallas-sort", "variant": "pallas",
                  "k": k, "L": L, "error": f"{type(e).__name__}: {e}"[:200]})
        for name, f in variants:
            try:
                t0 = time.perf_counter()
                out = f(xd)
                np.asarray(out[:1, :4])
                compile_s = time.perf_counter() - t0
                exact = np.array_equal(np.asarray(out), want)
                ts = []
                for _ in range(args.times):
                    t0 = time.perf_counter()
                    out = f(xd)
                    np.asarray(out[:1, :4])
                    ts.append(time.perf_counter() - t0)
                best = min(ts)
                emit({
                    "ab": "pallas-sort", "variant": name, "k": k, "L": L,
                    "block": args.block if name == "pallas" else None,
                    "t": round(best, 5),
                    "ns_per_elem": round(best * 1e9 / (k * L), 3),
                    "compile_s": round(compile_s, 1),
                    "bit_exact": bool(exact),
                })
            except Exception as e:
                emit({"ab": "pallas-sort", "variant": name, "k": k, "L": L,
                      "error": f"{type(e).__name__}: {e}"[:200]})


if __name__ == "__main__":
    main()
