"""Measure the presorted-w-runs bitonic shortcut (VERDICT r03 ask #4).

Idea: each expansion entry contributes an ascending w-wide column run, so a
bitonic network could skip its first log2(w) stages if the stream arrived
as ALTERNATING-direction, w-ALIGNED sorted runs.  This harness measures the
best case — the pass-skip saving on a synthetic stream that satisfies the
invariant perfectly — at the one production Pallas shape ([32768, 4096],
w=16: stages kk<=16 skipped = 10 of 78 passes).

The production verdict is arithmetic, recorded in the emitted row: real
streams mix class widths (mid-256k pieces: w=16 x1728, w=24 x1920, w=40
x360 slots) — non-pow2 runs cannot satisfy the stage invariant, and
rounding class widths to pow2 inflates the stream 4096 -> 4864 slots,
crossing the pow2 sort cliff (+~40% sort time) to buy a ~13%-of-one-sort
saving.  Run: python benchmarks/ab_wruns.py
"""
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

from binary_spgemm_tpu.ops.bitonic import _stages, _pick_block
from binary_spgemm_tpu.utils.trace import measure_dispatch_floor
from _provenance import emit


@functools.lru_cache(maxsize=None)
def make_kernel(L, B, min_kk):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stages = [(kk, j) for kk, j in _stages(L) if kk >= min_kk]

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        i = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        for kk, j in stages:
            is_lo = (i & j) == 0
            take_min = is_lo == ((i & kk) == 0)
            pj = pltpu.roll(x, -j % L, axis=1)
            mj = pltpu.roll(x, j, axis=1)
            partner = jnp.where(is_lo, pj, mj)
            x = jnp.where(
                take_min, jnp.minimum(x, partner), jnp.maximum(x, partner)
            )
        o_ref[...] = x

    def call(x):
        k = x.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(k // B,),
            in_specs=[pl.BlockSpec((B, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    return jax.jit(call)


def main() -> None:
    k, L, w = 32768, 4096, 16
    floor = measure_dispatch_floor()
    rng = np.random.default_rng(17)
    x = rng.integers(0, 1 << 30, (k, L), dtype=np.int32)
    # precondition: sort each aligned w-block; blocks with (start & w) != 0
    # descending — the exact invariant the full network's first log2(w)
    # stages establish
    xb = np.sort(x.reshape(k, L // w, w), axis=2)
    desc = (np.arange(L // w) * w & w) != 0
    xb[:, desc, :] = xb[:, desc, ::-1]
    xp = xb.reshape(k, L)
    want = np.sort(x, axis=1)

    B = _pick_block(k, L)
    results = {}
    for name, min_kk, inp in (("full", 2, x), ("skip-w16", 2 * w, xp)):
        f = make_kernel(L, B, min_kk)
        xd = jnp.asarray(inp)
        out = f(xd)
        exact = bool(np.array_equal(np.asarray(out), want))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(xd)
            np.asarray(out[:1, :4])
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        results[name] = t - floor
        emit({
            "ab": "wruns", "variant": name, "k": k, "L": L, "w": w,
            "min_kk": min_kk, "t": round(t, 5),
            "sort_device_s": round(t - floor, 5),
            "floor_s": round(floor, 6), "bit_exact": exact,
        })
        assert exact, name
    save = 1 - results["skip-w16"] / results["full"]
    emit({
        "ab": "wruns", "variant": "verdict", "bit_exact": "n/a",
        "t": 0.0,
        "pass_skip_saving_pct": round(save * 100, 1),
        "passes_skipped": "10 of 78",
        "note": (
            "REJECTED: saving applies to sort1 only and needs pow2-aligned "
            "alternating runs; production streams mix w={16,24,40} — "
            "rounding classes to pow2 inflates mid-256k 4096->4864 slots "
            "across the pow2 cliff (+~40% sort) to buy this saving"
        ),
    })


if __name__ == "__main__":
    main()
