"""Blocked boolean CSR: block-level sparsity over dense boolean blocks.

TPU-native re-design of the reference's two-level blocked format ``CSRbCSR``
(old/utils.h:10-21, builder ``csr2bcsr`` old/utils.c:157-295): the reference kept
a CSR *within* each nonzero block (good for scalar CPUs); here each nonzero block
is a **dense 0/1 tile** sized for the MXU (default 128×128), because on TPU a
dense tile multiply is far cheaper than any sparse-within-block bookkeeping when
block occupancy is non-trivial.  The block-level structure is itself a
:class:`..formats.bcsr.BCSR` over block coordinates, so every block-level
operation (including the block-structure product) reuses the ESC engine.

Use :func:`..ops.bsr.bsr_spgemm` for multiplication.  This format wins over flat
ESC when nonzeros cluster into blocks (banded/mesh/partitioned matrices); for
hyper-sparse uniform matrices, block occupancy ~d/b² makes it strictly worse —
the same trade the reference measured (its blocked designs never beat the flat
kernel on sprand inputs; report §2.1, old/README note).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .bcsr import BCSR

__all__ = ["BlockedBCSR"]


@dataclasses.dataclass
class BlockedBCSR:
    """Block-sparse boolean matrix: block-level BCSR + dense per-block tiles.

    ``structure`` is a BCSR of shape (n_brows, n_bcols) whose k-th stored entry
    corresponds to ``blocks[k]`` — a dense (b, b) uint8 0/1 tile.  Entries within
    a block row are stored with ascending block-column (canonical).
    """

    structure: BCSR
    blocks: np.ndarray  # uint8 [n_blocks, b, b]
    block_size: int
    shape: tuple[int, int]  # element-level shape (pre-padding)

    @property
    def n_blocks(self) -> int:
        return int(self.structure.nnz)

    @property
    def nnz(self) -> int:
        return int(self.blocks.sum())

    @classmethod
    def from_bcsr(cls, mat: BCSR, block_size: int = 128) -> "BlockedBCSR":
        """Build from element-level CSR (≡ csr2bcsr, old/utils.c:157-295)."""
        b = block_size
        rows, cols = mat.to_coo()
        brow, bcol = rows // b, cols // b
        n_brows = -(-mat.n_rows // b)
        n_bcols = -(-mat.n_cols // b)
        bkey = brow * n_bcols + bcol
        order = np.argsort(bkey, kind="stable")
        bkey_s = bkey[order]
        uniq, inv_first = np.unique(bkey_s, return_index=True)
        n_blocks = len(uniq)
        blocks = np.zeros((max(n_blocks, 1), b, b), dtype=np.uint8)
        block_of = np.searchsorted(uniq, bkey)  # block slot per element
        blocks[block_of, rows % b, cols % b] = 1
        structure = BCSR.from_coo(
            uniq // n_bcols, uniq % n_bcols, (n_brows, n_bcols)
        )
        return cls(structure, blocks[:n_blocks], b, tuple(mat.shape))

    def to_bcsr(self) -> BCSR:
        """Flatten back to element-level canonical CSR."""
        b = self.block_size
        brows, bcols = self.structure.to_coo()
        k, r, c = np.nonzero(self.blocks) if self.n_blocks else (
            np.zeros(0, int), np.zeros(0, int), np.zeros(0, int)
        )
        rows = brows[k] * b + r
        cols = bcols[k] * b + c
        keep = (rows < self.shape[0]) & (cols < self.shape[1])
        mat = BCSR.from_coo(rows[keep], cols[keep], self.shape)
        return mat.sum_duplicates()

    def block_occupancy(self) -> float:
        """Mean fraction of set bits per stored block (density diagnostic)."""
        if self.n_blocks == 0:
            return 0.0
        return float(self.blocks.mean())

    def __repr__(self):
        return (
            f"BlockedBCSR(shape={self.shape}, b={self.block_size}, "
            f"blocks={self.n_blocks}, occupancy={self.block_occupancy():.3f})"
        )
