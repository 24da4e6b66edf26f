"""VMEM-resident Pallas bitonic row sort — the 2-D sort path's fast kernel.

The sliced-ELL engines spend most of their device time in two
``jax.lax.sort(dimension=1)`` calls over ``[k, L]`` packed-key arrays (pair
sort + compaction sort; re-designs final/SpGEMM_mpi_omp.c:33-50's
SPA+quicksort accumulation as sort pipelines).  XLA's generic multi-pass
sort measured 0.56-0.83 ns/elem at the production shapes; this kernel holds
each ``[B, L]`` row block in VMEM for the whole network and exchanges
bitonic partners with two fixed-stride ``pltpu.roll`` rotations per stage —
the one cross-lane shuffle Mosaic has (no arbitrary gather exists, which is
what killed the Pallas *gather* candidate, benchmarks/pallas_gather.py).

Measured A/B (benchmarks/sort_rate_table.py, micro.jsonl
bench="sort_rate_table" 2026-08-20, ex-dispatch, bit-exact): at L=4096 this
kernel wins vs XLA's ``is_stable=False`` sort (0.2374 vs 0.2678 ns/elem;
in-context +4% e2e at mid-256k).  Below L=4096 XLA's unstable sort is
FASTER (L=2048: 0.188 vs 0.232; L=256: 0.044 vs 0.169) — round 3's wider
window was calibrated against the stable default sort, which pays an
implicit iota payload the engines never use.  L=8192 hit a pathological
Mosaic compile (>25 min through the remote tunnel).  The eligibility
window below is therefore exactly L=4096.

``sort_rows`` is a drop-in for single-operand ascending
``jax.lax.sort(x, dimension=1, is_stable=False)``: pure value semantics
(no payload, so stability is moot) — the output is bit-identical to XLA's
by definition of sorting.  Ineligible shapes/platforms fall back to
``lax.sort`` at trace time, so CPU tests and odd shapes are unaffected.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["sort_rows", "bitonic_sort_rows"]

# Eligibility window, recalibrated round 4 (benchmarks/sort_rate_table.py,
# micro.jsonl bench="sort_rate_table" 2026-08-20, ex-dispatch ns/elem at
# 2^27 elems): L=4096 is the ONE length where this kernel beats XLA's
# is_stable=False sort (0.2374 vs 0.2678; confirmed in-context +4% e2e at
# mid-256k).  Round 3's wider [256, 4096] window came from comparing
# against a STABLE lax.sort (the default — it drags an implicit iota
# payload); against the unstable sort the engines actually run, XLA wins
# decisively below 4096 (L=2048: 0.188 vs 0.232; L=256: 0.044 vs 0.169).
# L=8192 compiles pathologically (>25 min remote Mosaic hang).  Block rows
# per grid step follow the measured-safe VMEM budget: [128, 4096] (2 MB)
# crashed the remote Mosaic compiler while [32, 4096] compiles and wins.
# Kill-switch: BSPGEMM_PALLAS_SORT=0.
_MIN_L = 4096
_MAX_L = 4096


def _stages(L: int) -> list[tuple[int, int]]:
    """Bitonic network (kk, j) stage list for pow2 length L."""
    out = []
    kk = 2
    while kk <= L:
        j = kk // 2
        while j >= 1:
            out.append((kk, j))
            j //= 2
        kk *= 2
    return out


@functools.lru_cache(maxsize=None)
def _make_kernel(L: int, B: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stages = _stages(L)

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        # iota-derived masks with static j/kk fold to per-stage constants:
        #   is_lo[i]    = (i & j) == 0          (partner at i+j, else i-j)
        #   take_min[i] = is_lo[i] == ((i & kk) == 0)
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

    def call(x):
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

    return call


def bitonic_sort_rows(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Sort each row of ``[k, L]`` int32 ``x`` ascending (L pow2, k % B == 0)."""
    k, L = x.shape
    B = _pick_block(k, L)
    if B is None:
        raise ValueError(f"no block size divides k={k}")
    return _make_kernel(L, B, interpret)(x)


def _pick_block(k: int, L: int) -> int | None:
    cap = 128 if L <= 2048 else 32  # measured-safe VMEM block budget
    for b in (128, 64, 32, 16, 8):
        if b <= cap and k % b == 0:
            return b
    return None


def _on_tpu() -> bool:
    try:
        d = jax.devices()[0]
    except Exception:
        return False
    return "tpu" in getattr(d, "device_kind", "").lower()


def eligible(k: int, L: int) -> bool:
    """Shape/env gate for the Pallas path: measured-win window on an
    attached TPU.  ``_on_tpu()`` consults the process-default device — used
    for host-side plan pricing; the actual lowering decision in
    :func:`sort_rows` is platform-resolved per backend, so tracing for a
    non-default device (explicit CPU ``device_put`` in a TPU process) still
    lowers correctly."""
    if os.environ.get("BSPGEMM_PALLAS_SORT", "1") == "0":
        return False
    if L < _MIN_L or L > _MAX_L or L & (L - 1):
        return False
    if _pick_block(k, L) is None:
        return False
    return _on_tpu()


def _lax_sort_rows(x: jax.Array) -> jax.Array:
    return jax.lax.sort(x, dimension=1, is_stable=False)


def sort_rows(x: jax.Array) -> jax.Array:
    """``jax.lax.sort(x, dimension=1, is_stable=False)`` for int32 ``[k, L]``,
    via the Pallas bitonic kernel when :func:`eligible` — bit-identical
    output either way (value sort, no payload).  The Pallas branch is
    selected by ``lax.platform_dependent`` at LOWERING time (resolved
    statically for single-platform lowerings), so a CPU lowering from a
    TPU-default process falls back to ``lax.sort`` instead of embedding an
    uncompilable TPU kernel."""
    k, L = x.shape
    if x.dtype == jnp.int32 and eligible(k, L):
        return jax.lax.platform_dependent(
            x, tpu=bitonic_sort_rows, default=_lax_sort_rows
        )
    return _lax_sort_rows(x)


@functools.lru_cache(maxsize=None)
def _make_fused_kernel(L: int, B: int, limit: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stages = _stages(L)
    sentinel = jnp.iinfo(jnp.int32).max

    def _net(x, i, roll):
        for kk, j in stages:
            is_lo = (i & j) == 0
            take_min = is_lo == ((i & kk) == 0)
            partner = jnp.where(is_lo, roll(x, -j), roll(x, j))
            x = jnp.where(
                take_min, jnp.minimum(x, partner), jnp.maximum(x, partner)
            )
        return x

    def kernel(x_ref, o_ref):
        if interpret:
            roll = lambda v, s: jnp.roll(v, s, axis=1)
        else:
            roll = lambda v, s: pltpu.roll(v, s % L, axis=1)
        i = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        s = _net(x_ref[...], i, roll)
        # dedup against the left neighbour (position 0's virtual prev is -1,
        # always a mismatch for the engine's non-negative keys) and demote
        # everything else to the top sentinel — ≡ sort_compress_seps_2d's
        # keep/demote pass, fused so the intermediate never touches HBM
        keep = ((s != roll(s, 1)) | (i == 0)) & (s < limit)
        o_ref[...] = _net(jnp.where(keep, s, sentinel), i, roll)

    def call(x):
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

    return call


def fused_sort_compress(
    x: jax.Array, limit: int, *, interpret: bool = False
) -> jax.Array:
    """The packable ``sort_compress_seps_2d`` device pipeline — pair sort,
    left-neighbour dedup, demote-to-sentinel, compaction sort — as ONE
    VMEM-resident kernel: each ``[B, L]`` row block makes a single HBM
    round trip instead of three (sort out, dedup/demote, sort out), and
    both bitonic networks run back-to-back on registers.  Returns the
    compacted sorted keys (valid ascending prefix, ``int32 max`` fill);
    the per-row valid count is ``sum(out < limit, axis=1)`` — computed by
    the caller where XLA fuses it with the key unpack.  Bit-identical to
    the unfused path (value semantics throughout)."""
    k, L = x.shape
    B = _pick_block(k, L)
    if B is None:
        raise ValueError(f"no block size divides k={k}")
    return _make_fused_kernel(L, B, int(limit), interpret)(x)
