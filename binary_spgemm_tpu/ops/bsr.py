"""Blocked boolean SpGEMM on the MXU.

TPU-native re-design of the reference's blocked design space (``BSpGEMM*``,
old/BSpGEMM.c:369-1489): block-level Gustavson over a two-level format, with the
per-block-pair product and OR-accumulation.  The reference's within-block sparse
kernels and ``SpM_OR`` pointer-swapping accumulators (old/BSpGEMM.c:552-564)
become:

* **block-pair expansion** — the block-level structure walk, done host-side in
  vectorised numpy (block counts are ~10⁴, negligible next to element work);
* **batched dense tile matmuls on the MXU** — every (A-block, B-block) pair is a
  bf16 128×128×128 matmul with f32 accumulation (0/1 values ⇒ exact counts);
* **segment-sum OR-accumulation** — pairs sorted by output block; a single
  block-granular ``segment_sum`` replaces the reference's merge/OR machinery;
  ``count > 0`` is the boolean OR.

The reference found blocking never beat its flat kernel on hyper-sparse random
inputs (report §2.1) — the same holds here (occupancy ~d/b²), but on matrices
with clustered structure the MXU path turns memory-latency-bound sparse work
into dense FLOPs, which is exactly what the hardware wants.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.bbcsr import BlockedBCSR
from ..formats.bcsr import BCSR
from .spgemm import pad_bucket

__all__ = [
    "bsr_spgemm",
    "block_pairs",
    "BsrExecutor",
    "BsrStagedExecutor",
    "block_clustering_ratio",
    "maybe_bsr_executor",
]


def block_clustering_ratio(mat: BCSR, block: int = 128) -> float:
    """Mean nonzeros per touched ``block×block`` tile (1 ≈ uniform scatter,
    ≫1 ≈ block-clustered).  The routing signal for the MXU path: measured on
    v5e, a 0.12-occupancy block-clustered input runs 56× faster through
    ``BsrExecutor`` than through the general sort-based engine."""
    if mat.nnz == 0:
        return 0.0
    # bounded cost: a strided sample of entries (rows recovered by binary
    # search into indptr); clustered inputs show high per-block multiplicity
    # in any dense-enough sample, uniform ones stay ≈1
    k = min(mat.nnz, 1 << 19)
    pos = np.linspace(0, mat.nnz - 1, k).astype(np.int64)
    rows = np.searchsorted(mat.indptr, pos, side="right") - 1
    n_bcols = -(-mat.n_cols // block)
    keys = (rows // block) * n_bcols + mat.indices[pos] // block
    # the sample estimates the touched-tile count; the numerator must stay
    # the full nnz or clustering is understated by nnz/sample for large mats
    return mat.nnz / len(np.unique(keys))

# Pair-chunk size for the batched matmul (bounds device memory:
# 2 × chunk × b² bf16 gathered operands ≈ 2 × 512 × 16K × 2B = 32 MB).
PAIR_CHUNK = 512


def block_pairs(
    a: BlockedBCSR, b: BlockedBCSR
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All (A-block, B-block) products and their output blocks, host-side.

    Returns ``(ka, kb, seg, out_brow, out_bcol)``: pair p multiplies A-block
    ``ka[p]`` with B-block ``kb[p]`` into output block ``seg[p]`` (pairs sorted
    by seg); output block s has block coords (out_brow[s], out_bcol[s]).
    """
    sa, sb = a.structure, b.structure
    arow, acol = sa.to_coo()  # block coords of A's stored blocks
    lens = np.diff(sb.indptr)[acol]
    ka = np.repeat(np.arange(sa.nnz, dtype=np.int64), lens)
    offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
    total = int(lens.sum())
    kb = (
        np.arange(total, dtype=np.int64)
        - np.repeat(offs, lens)
        + np.repeat(sb.indptr[acol], lens)
    )
    out_i = np.repeat(arow, lens)
    out_k = sb.indices[kb]
    okey = out_i * np.int64(sb.n_cols) + out_k
    order = np.argsort(okey, kind="stable")
    ka, kb, okey = ka[order], kb[order], okey[order]
    uniq, seg = np.unique(okey, return_inverse=True)
    return ka, kb, seg, uniq // sb.n_cols, uniq % sb.n_cols


@functools.partial(jax.jit, static_argnames=("n_out",))
def _pair_matmul_accumulate(
    a_blocks: jax.Array,  # bf16 [nA, b, b]
    b_blocks: jax.Array,  # bf16 [nB, b, b]
    ka: jax.Array,  # int32 [chunk]
    kb: jax.Array,  # int32 [chunk]
    seg: jax.Array,  # int32 [chunk], sorted; n_out for padding
    acc: jax.Array,  # f32 [n_out, b, b]
    *,
    n_out: int,
) -> jax.Array:
    ag = a_blocks[ka]
    bg = b_blocks[kb]
    prod = jax.lax.dot_general(
        ag, bg,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return acc + jax.ops.segment_sum(
        prod, seg, num_segments=n_out, indices_are_sorted=True
    )


def _pad_pair_plan(ka, kb, seg, n_out):
    """Bucket-pad the (ka, kb, seg) pair plan; tail pairs target a scratch
    segment ``n_out`` (dropped by callers).  ``first`` marks each output
    block's first pair (zero-init) including the scratch block's."""
    npairs = len(ka)
    npairs_pad = pad_bucket(max(npairs, 1), minimum=1)
    seg_p = np.full(npairs_pad, n_out, np.int32)
    ka_p = np.zeros(npairs_pad, np.int32)
    kb_p = np.zeros(npairs_pad, np.int32)
    seg_p[:npairs] = seg
    ka_p[:npairs] = ka
    kb_p[:npairs] = kb
    first = np.zeros(npairs_pad, np.int32)
    if npairs:
        first[0] = 1
        first[1:npairs] = (np.diff(seg) != 0).astype(np.int32)
    if npairs < npairs_pad:
        first[npairs] = 1  # init the scratch block
    return seg_p, ka_p, kb_p, first


class BsrExecutor:
    """Pre-staged repeated blocked C = A·B on the MXU.

    Stages the bf16 tile arrays and the (padded) pair plan on device ONCE —
    ``bsr_spgemm``'s per-call host↔device block transfers dominate its wall
    time on tunnel-attached devices — so each :meth:`run` is a single device
    program: grouped Pallas tile matmuls + in-VMEM accumulation.  ``run``
    returns the f32 per-output-block count tiles; :meth:`assemble` thresholds
    and packs them into a :class:`BlockedBCSR`.
    """

    def __init__(self, a: BlockedBCSR, b: BlockedBCSR):
        if a.block_size != b.block_size:
            raise ValueError("block sizes must match")
        if a.structure.n_cols != b.structure.n_rows:
            raise ValueError(f"block shape mismatch: {a.shape} @ {b.shape}")
        self.bs = a.block_size
        self.shape = (a.shape[0], b.shape[1])
        self.block_shape = (a.structure.n_rows, b.structure.n_cols)
        ka, kb, seg, self.obr, self.obc = block_pairs(a, b)
        self.n_out = len(self.obr)
        self.a_dev = jnp.asarray(a.blocks, jnp.bfloat16)
        self.b_dev = jnp.asarray(b.blocks, jnp.bfloat16)
        seg_p, ka_p, kb_p, first = _pad_pair_plan(ka, kb, seg, self.n_out)
        self.seg = jnp.asarray(seg_p)
        self.ka = jnp.asarray(ka_p)
        self.kb = jnp.asarray(kb_p)
        self.first = jnp.asarray(first)

    def run(self):
        """f32 [n_out+1, b, b] per-output-block pair-product counts (device);
        the last block is padding scratch."""
        from .pallas_bsr import grouped_block_matmul

        return grouped_block_matmul(
            self.seg, self.ka, self.kb, self.first,
            self.a_dev, self.b_dev,
            n_out=self.n_out + 1,
            interpret=jax.default_backend() != "tpu",
        )

    def assemble(self, counts) -> BlockedBCSR:
        blocks = (np.asarray(counts[: self.n_out]) > 0).astype(np.uint8)
        nonzero = blocks.reshape(self.n_out, -1).any(axis=1) if self.n_out else (
            np.zeros(0, bool)
        )
        structure = BCSR.from_coo(
            self.obr[nonzero], self.obc[nonzero], self.block_shape
        )
        return BlockedBCSR(structure, blocks[nonzero], self.bs, self.shape)


class BsrStagedExecutor:
    """:func:`..ell.auto_executor`-compatible facade over :class:`BsrExecutor`.

    Same staged contract as the sort engines — build once, then
    ``assemble(run())`` returns a flat canonical :class:`BCSR` — so the auto
    router can hand block-clustered inputs to the MXU engine without callers
    noticing.  ``run()`` leaves the f32 count tiles resident in HBM (the
    reference protocol times the multiply only, final/SpGEMM_mpi_omp.c:318);
    ``assemble`` thresholds them host-side and flattens.
    """

    engine = "bsr"

    def __init__(
        self,
        a: BCSR,
        b: BCSR,
        block: int = 128,
        *,
        _blocked: "tuple[BlockedBCSR, BlockedBCSR] | None" = None,
    ):
        self.block = block
        if _blocked is not None:
            self._blk_a, self._blk_b = _blocked
        else:
            self._blk_a = BlockedBCSR.from_bcsr(a, block)
            self._blk_b = (
                self._blk_a if b is a else BlockedBCSR.from_bcsr(b, block)
            )
        self._ex = BsrExecutor(self._blk_a, self._blk_b)
        # auto_executor-facade diagnostics (sort-engine names kept loose on
        # purpose: sweep/bench report these generically)
        self.n_chunks = 1
        self.n_pairs = int(self._ex.seg.shape[0])
        self.n_out = self._ex.n_out

    def run(self):
        return self._ex.run()

    def assemble(self, counts) -> BCSR:
        return self._ex.assemble(counts).to_bcsr()


# Staged-route screen for the MXU engine (consulted by
# ``ops.ell.auto_executor`` / ``cached_executor(allow_bsr=True)``).
#
# The routing signal is mean occupancy of TOUCHED block tiles
# (block_clustering_ratio / block²): the MXU path spends b³ dense MACs per
# block pair regardless of occupancy, so its advantage over the sort engines
# scales ~linearly with occupancy.  Measured anchors on the attached v5e:
# blocked-32k-b128 (occupancy 0.30): auto-ELL 0.353 s vs BsrExecutor 0.027 s
# (13x, results.jsonl 2026-08-21); a 0.12-occupancy clustered input measured
# 56x over ESC (round 1).  Uniform sprand inputs sit at occupancy ~d/b²
# (~1e-4): the reference's own conclusion that blocking loses there
# (report §2.1) holds here too.  The 0.05 floor keeps a ~2.4x margin under
# the worst measured win; genuinely borderline inputs stay on the measured
# sort path rather than gambling on an unmeasured regime.
BSR_MIN_OCCUPANCY = 0.05
# Staged tile bytes (bf16 operands + f32 accumulator) the route may pin in
# HBM; past this the sort engines' streaming plans are the safer bet.
BSR_MAX_STAGED_BYTES = 2 << 30


def maybe_bsr_executor(a: BCSR, b: BCSR) -> "BsrStagedExecutor | None":
    """Build the staged MXU executor when the operands are block-clustered
    enough for it to win, else None (caller falls through to the sort
    engines).  Cheap screen first (sampled clustering ratio, O(min(nnz,
    2^19))), then exact byte budgets on the built plan."""
    block = 128
    b2 = block * block
    if a.nnz == 0 or b.nnz == 0:
        return None
    # only meaningful at scale (same screen as ``blocked_route``): tiny
    # shapes make the per-tile ratio noise, and the host engine owns the
    # small-flop regime anyway
    if a.nnz < (1 << 17) or min(*a.shape, *b.shape) < 2048:
        return None
    if block_clustering_ratio(a, block) / b2 < BSR_MIN_OCCUPANCY:
        return None
    if b is not a and block_clustering_ratio(b, block) / b2 < BSR_MIN_OCCUPANCY:
        return None
    try:
        blk_a = BlockedBCSR.from_bcsr(a, block)
        blk_b = blk_a if b is a else BlockedBCSR.from_bcsr(b, block)
        # exact byte budget BEFORE anything touches the device: operand
        # tiles (bf16) + the accumulator (f32, one tile per output block)
        n_out = len(np.unique(block_pairs(blk_a, blk_b)[2]))
        staged_bytes = (
            (blk_a.n_blocks + blk_b.n_blocks) * b2 * 2 + (n_out + 1) * b2 * 4
        )
        if staged_bytes > BSR_MAX_STAGED_BYTES:
            return None
        return BsrStagedExecutor(a, b, block, _blocked=(blk_a, blk_b))
    except (ValueError, MemoryError):
        return None


def bsr_spgemm(
    a: BlockedBCSR,
    b: BlockedBCSR,
    *,
    mask: BlockedBCSR | None = None,
    backend: str = "auto",
) -> BlockedBCSR:
    """Blocked boolean SpGEMM: C = A·B structure over dense MXU tiles.

    ``mask`` applies C = mask .* (A·B) block-wise (≡ ``BSpGEMM_d_masked``,
    old/BSpGEMM.c:657-822): output blocks outside the mask's block structure
    are dropped entirely, in-mask blocks are ANDed with the mask tile.

    ``backend``: ``"pallas"`` — the grouped Pallas kernel
    (:mod:`.pallas_bsr`; interpreted off-TPU); ``"xla"`` — batched
    ``dot_general`` + ``segment_sum``; ``"auto"`` — pallas.
    """
    if mask is not None and (
        mask.block_size != a.block_size or mask.shape != (a.shape[0], b.shape[1])
    ):
        raise ValueError("mask must share block size and product shape")
    if a.block_size != b.block_size:
        raise ValueError("block sizes must match")
    if a.structure.n_cols != b.structure.n_rows:
        raise ValueError(f"block shape mismatch: {a.shape} @ {b.shape}")
    if backend not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown backend {backend!r}")
    bs = a.block_size
    shape = (a.shape[0], b.shape[1])
    ka, kb, seg, obr, obc = block_pairs(a, b)
    n_out = len(obr)
    if n_out == 0:
        structure = BCSR(
            np.zeros(a.structure.n_rows + 1, np.int32),
            np.zeros(0, np.int32),
            (a.structure.n_rows, b.structure.n_cols),
        )
        return BlockedBCSR(structure, np.zeros((0, bs, bs), np.uint8), bs, shape)

    a_dev = jnp.asarray(a.blocks, jnp.bfloat16)
    b_dev = jnp.asarray(b.blocks, jnp.bfloat16)
    npairs = len(ka)

    if backend in ("auto", "pallas"):
        from .pallas_bsr import grouped_block_matmul

        # pad the pair list to a bucket; tail pairs write a scratch block
        # (segment n_out) that is dropped, keeping one compile per bucket
        seg_p, ka_p, kb_p, first = _pad_pair_plan(ka, kb, seg, n_out)
        counts = grouped_block_matmul(
            jnp.asarray(seg_p), jnp.asarray(ka_p), jnp.asarray(kb_p),
            jnp.asarray(first), a_dev, b_dev,
            n_out=n_out + 1,
            interpret=jax.default_backend() != "tpu",
        )
        blocks = (np.asarray(counts[:n_out]) > 0).astype(np.uint8)
    else:
        # +1 guarantees a scratch segment: padded tail pairs accumulate there
        # and are discarded, keeping every chunk the same shape (one compile).
        n_out_pad = pad_bucket(n_out + 1, minimum=2)
        acc = jnp.zeros((n_out_pad, bs, bs), jnp.float32)
        for p0 in range(0, npairs, PAIR_CHUNK):
            chunk = slice(p0, min(p0 + PAIR_CHUNK, npairs))
            cka = np.zeros(PAIR_CHUNK, np.int32)
            ckb = np.zeros(PAIR_CHUNK, np.int32)
            cseg = np.full(PAIR_CHUNK, n_out_pad - 1, np.int32)
            w = chunk.stop - chunk.start
            cka[:w], ckb[:w] = ka[chunk], kb[chunk]
            cseg[:w] = seg[chunk]
            acc = _pair_matmul_accumulate(
                a_dev, b_dev,
                jnp.asarray(cka), jnp.asarray(ckb), jnp.asarray(cseg),
                acc, n_out=n_out_pad,
            )
        blocks = (np.asarray(acc[:n_out]) > 0).astype(np.uint8)

    if mask is not None:
        # block-wise AND with the mask: match output blocks to mask blocks by
        # block coordinate; unmatched output blocks vanish
        n_bcols = b.structure.n_cols
        mrow, mcol = mask.structure.to_coo()
        mkeys = mrow * np.int64(n_bcols) + mcol
        okeys = obr * np.int64(n_bcols) + obc
        if len(mkeys) == 0:
            blocks = np.zeros_like(blocks)
        else:
            pos_c = np.minimum(np.searchsorted(mkeys, okeys), len(mkeys) - 1)
            inmask = mkeys[pos_c] == okeys
            blocks = np.where(
                inmask[:, None, None], blocks & mask.blocks[pos_c], 0
            ).astype(np.uint8)

    # drop all-zero output blocks (a structural block pair can yield no bits)
    nonzero = blocks.reshape(n_out, -1).any(axis=1)
    blocks = blocks[nonzero]
    structure = BCSR.from_coo(
        obr[nonzero], obc[nonzero],
        (a.structure.n_rows, b.structure.n_cols),
    )
    return BlockedBCSR(structure, blocks, bs, shape)
