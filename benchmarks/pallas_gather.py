"""Pallas prototype: VMEM-resident class-table row gather (+ key pack).

Round-2 verdict ask #3 — the last untried structural lever on the
15%→70% roofline gap is a Pallas kernel for the sort-engine hot path.  The
measured decomposition at mid-64k-d16 is ~50% expansion (class-table row
gathers) / ~35% sorts; XLA's gather measured 8.5/w + 0.3 ns per slot
(benchmarks/micro.jsonl "gather_width"), far above the table's bandwidth
SOL.  The whole ELL table of the headline config is ~5 MB — it FITS VMEM
(~16 MB/core), so a Pallas kernel can hold it resident and stream only the
entry positions + gathered output through HBM:

    HBM traffic = 4·E (positions) + 4·E·w (output) bytes ≈ 80 MB at the
    headline vs the ~8.6 GB the per-slot gather model implies.

This harness measures three variants against the XLA baseline on the real
chip and appends ab="pallas-gather" rows to results.jsonl:
  xla        — jnp gather `table[pos]` (the production expansion primitive)
  pallas     — VMEM table + vector gather (`jnp.take` inside the kernel)
  pallas-key — same, fused with the (row << shift) | col key pack, emitting
               the sort-ready key stream directly (saves one round trip)

Win → integrate behind an executor flag; loss/compile-reject → recorded
here and in ROADMAP (the builder's measure-and-reject discipline).
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _provenance import emit

BLOCK = 2048  # positions per grid step


def _gather_kernel(pos_ref, table_ref, out_ref):
    # table stays whole in VMEM across grid steps; pos block streams in
    out_ref[:] = jnp.take(table_ref[:], pos_ref[:], axis=0)


def pallas_gather(table: jax.Array, pos: jax.Array) -> jax.Array:
    t, w = table.shape
    e = pos.shape[0]
    return pl.pallas_call(
        _gather_kernel,
        grid=(e // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((e, w), jnp.int32),
    )(pos, table)


def _gather_key_kernel(pos_ref, rows_ref, table_ref, out_ref, *, shift):
    cols = jnp.take(table_ref[:], pos_ref[:], axis=0)  # [BLOCK, w]
    out_ref[:] = (rows_ref[:][:, None] << shift) | cols


def pallas_gather_keys(
    table: jax.Array, pos: jax.Array, rows: jax.Array, shift: int
) -> jax.Array:
    t, w = table.shape
    e = pos.shape[0]
    return pl.pallas_call(
        functools.partial(_gather_key_kernel, shift=shift),
        grid=(e // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((e, w), jnp.int32),
    )(pos, rows, table)


@functools.partial(jax.jit, static_argnames=())
def xla_gather(table, pos):
    return table[pos]


def timed(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(out[:1, :1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[:1, :1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    # headline-class shape: 64K-row B, w=16 class, ~1M gathers (16.8M slots)
    rng = np.random.default_rng(0)
    t, w, e = 1 << 16, 16, 1 << 20
    table = jnp.asarray(rng.integers(0, 1 << 16, (t, w), dtype=np.int32))
    pos = jnp.asarray(rng.integers(0, t, (e,), dtype=np.int32))
    rows = jnp.asarray(rng.integers(0, 8192, (e,), dtype=np.int32))
    slots = e * w

    t_x = timed(xla_gather, table, pos)
    ref = np.asarray(xla_gather(table, pos))
    rec = {"ab": "pallas-gather", "variant": "xla", "t": round(t_x, 5),
           "ns_per_slot": round(t_x / slots * 1e9, 3), "w": w, "E": e,
           "bit_exact": "n/a"}  # pure rate probe: ref is DEFINED by this run
    emit(rec)

    try:
        t_p = timed(pallas_gather, table, pos)
        ok = np.array_equal(np.asarray(pallas_gather(table, pos)), ref)
        emit({"ab": "pallas-gather", "variant": "pallas", "t": round(t_p, 5),
              "ns_per_slot": round(t_p / slots * 1e9, 3), "w": w, "E": e,
              "bit_exact": bool(ok), "speedup_vs_xla": round(t_x / t_p, 2)})
    except Exception as err:  # noqa: BLE001 — Mosaic may reject the gather
        emit({"ab": "pallas-gather", "variant": "pallas",
              "error": f"{type(err).__name__}: {str(err)[:300]}"})

    try:
        shift = 17
        t_k = timed(pallas_gather_keys, table, pos, rows, shift)
        exp = (np.asarray(rows)[:, None] << shift) | ref
        ok = np.array_equal(
            np.asarray(pallas_gather_keys(table, pos, rows, shift)), exp
        )
        emit({"ab": "pallas-gather", "variant": "pallas-key",
              "t": round(t_k, 5), "ns_per_slot": round(t_k / slots * 1e9, 3),
              "w": w, "E": e, "bit_exact": bool(ok),
              "speedup_vs_xla": round(t_x / t_k, 2)})
    except Exception as err:  # noqa: BLE001
        emit({"ab": "pallas-gather", "variant": "pallas-key",
              "error": f"{type(err).__name__}: {str(err)[:300]}"})


if __name__ == "__main__":
    main()
