"""binary_spgemm_tpu — a TPU-native boolean SpGEMM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the MPI+OpenMP
reference ``pavlidic/Binary-SpGEMM``: the sparsity structure of C = A·B (and
C = A·A) over boolean CSR matrices, Matrix-Market ingest, masked multiply
C = F.*(A·B), row-wise sparse union, a row-partitioned multi-chip path over a
``jax.sharding.Mesh``, and a benchmark/validation CLI emitting the reference's
CSV schema.

The compute core is not a translation of the reference's scalar Gustavson+SPA
loop (which is latency-bound random access — the opposite of what TPUs like);
it is a two-pass expand–sort–compress (ESC) pipeline built from vectorised XLA
primitives and Pallas kernels with static padded shapes.  See ARCHITECTURE.md.
"""
from .formats.bcsr import BCSR, coo_to_csr_stable
from .formats.bbcsr import BlockedBCSR
from .io.mmio import read_pattern, write_integer, write_pattern
from .ops.spgemm import SpGEMMExecutor, spgemm, spgemm_flops
from .ops.masked import masked_spgemm
from .ops.union import spm_or
from .ops.fused import spgemm_or
from .ops.bsr import bsr_spgemm
from .ops.ell import EllSpGEMMExecutor, ell_spgemm
from .ops.counts import masked_spgemm_counts, spgemm_counts
from .ops.onesort import (
    PaddedDeviceBCSR,
    spgemm_onesort_device,
    spgemm_or_onesort_device,
)
from .ops.graph import (
    bfs_levels,
    k_hop,
    reachable,
    transitive_closure,
    triangle_count,
    triangle_structure,
)

__all__ = [
    "BCSR",
    "BlockedBCSR",
    "SpGEMMExecutor",
    "EllSpGEMMExecutor",
    "ell_spgemm",
    "coo_to_csr_stable",
    "read_pattern",
    "write_pattern",
    "write_integer",
    "spgemm",
    "spgemm_counts",
    "spgemm_flops",
    "spgemm_or",
    "masked_spgemm",
    "masked_spgemm_counts",
    "spm_or",
    "bsr_spgemm",
    "PaddedDeviceBCSR",
    "spgemm_onesort_device",
    "spgemm_or_onesort_device",
    "bfs_levels",
    "k_hop",
    "reachable",
    "transitive_closure",
    "triangle_count",
    "triangle_structure",
]

__version__ = "0.1.0"
