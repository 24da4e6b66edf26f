"""Pallas TPU kernel: grouped block-matmul-accumulate for the blocked path.

The hot loop of :func:`.bsr.bsr_spgemm` — "for every (A-block, B-block) pair,
multiply the dense tiles and OR-accumulate into the output block" — as a single
Pallas kernel using ``PrefetchScalarGridSpec``:

* the grid walks the pair list (sorted by output block);
* the scalar-prefetched index arrays steer the BlockSpec index maps, so the
  pipeline DMAs exactly the A/B tiles each pair needs (double-buffered by the
  Pallas pipeline automatically);
* consecutive pairs that hit the same output block keep it resident in VMEM —
  the first pair of a group zeroes it (``first`` flags), later pairs
  ``+=`` their MXU product, replacing the reference's ``SpM_OR``
  pointer-swapping accumulators (old/BSpGEMM.c:552-564) with in-register
  accumulation.

Tiles are bf16 with f32 accumulation: 0/1 products are exact, so ``count > 0``
is the boolean OR.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["grouped_block_matmul"]


def _kernel(seg_ref, ka_ref, kb_ref, first_ref, a_ref, b_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jax.lax.dot_general(
        a_ref[0],
        b_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[None]


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def grouped_block_matmul(
    seg: jax.Array,  # int32 [npairs] output-block id per pair, sorted
    ka: jax.Array,  # int32 [npairs] A-block id per pair
    kb: jax.Array,  # int32 [npairs] B-block id per pair
    first: jax.Array,  # int32 [npairs] 1 at each output-block group start
    a_blocks: jax.Array,  # bf16 [nA, b, b]
    b_blocks: jax.Array,  # bf16 [nB, b, b]
    *,
    n_out: int,
    interpret: bool = False,
) -> jax.Array:
    """f32 [n_out, b, b] per-output-block pair-product counts."""
    bs = a_blocks.shape[-1]
    npairs = seg.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(npairs,),
        in_specs=[
            pl.BlockSpec((1, bs, bs), lambda i, seg, ka, kb, first: (ka[i], 0, 0)),
            pl.BlockSpec((1, bs, bs), lambda i, seg, ka, kb, first: (kb[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, bs, bs), lambda i, seg, ka, kb, first: (seg[i], 0, 0)
        ),
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_out, bs, bs), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * npairs * bs * bs * bs,
            bytes_accessed=npairs * bs * bs * 2 * 2 + n_out * bs * bs * 4,
            transcendentals=0,
        ),
    )(seg, ka, kb, first, a_blocks, b_blocks)
