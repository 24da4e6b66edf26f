"""Graph-algorithm conveniences over the boolean SpGEMM core.

The reference computes C = A·A on graph adjacency patterns (its benchmark
inputs are sprand adjacency matrices); these helpers package the standard uses
of that primitive — k-hop reachability, transitive closure, and triangle
structure (the canonical masked-SpGEMM application) — as first-class ops.
All reuse the ESC engine, so they inherit bit-exactness and chunking.
"""
from __future__ import annotations

import numpy as np

from ..formats.bcsr import BCSR
from .fused import spgemm_or
from .masked import masked_spgemm
from .spgemm import spgemm

__all__ = ["k_hop", "transitive_closure", "triangle_structure", "triangle_count"]


def k_hop(a: BCSR, k: int, *, chunk_flops: int | None = None) -> BCSR:
    """Structure of A^k (nodes reachable in exactly ≤k-hop products).

    Computed by binary exponentiation — log2(k) SpGEMMs.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    result = None
    power = a.sum_duplicates()
    while k:
        if k & 1:
            result = power if result is None else spgemm(
                result, power, chunk_flops=chunk_flops
            )
        k >>= 1
        if k:
            power = spgemm(power, power, chunk_flops=chunk_flops)
    return result


def transitive_closure(
    a: BCSR, *, max_iters: int | None = None, chunk_flops: int | None = None
) -> BCSR:
    """Reachability closure: OR of A, A², A⁴, ... until fixpoint.

    Doubling iteration: R ← R OR R·R; converges in ⌈log2(diameter)⌉ rounds.
    """
    if a.n_rows != a.n_cols:
        raise ValueError("closure needs a square matrix")
    r = a.sum_duplicates()
    iters = max_iters if max_iters is not None else max(1, a.n_rows.bit_length())
    for _ in range(iters):
        # one fused pass per round: the union rides the product's sort
        # (spgemm_or pre-seeds the candidate stream with D ≡ SpGEMM_dor's
        # SPA pre-seed, old/BSpGEMM.c:75-126) instead of a second sort
        nxt = spgemm_or(r, r, r, chunk_flops=chunk_flops)
        if nxt.nnz == r.nnz and nxt.equals(r):
            return r
        r = nxt
    return r


def triangle_structure(a: BCSR, *, chunk_flops: int | None = None) -> BCSR:
    """Edges (i, j) of A that close at least one triangle: A .* (A·A).

    The canonical masked-SpGEMM workload (≡ SpGEMM_masked with F = A,
    final/SpGEMM_mpi_omp.c:232-288).
    """
    if a.n_rows != a.n_cols:
        raise ValueError("triangles need a square matrix")
    return masked_spgemm(a, a, a, chunk_flops=chunk_flops)


def triangle_count(a: BCSR) -> int:
    """Number of triangles in the undirected simple graph with adjacency A.

    A must be symmetric with an empty diagonal.  Uses the structure-only
    identity: a triangle {i,j,k} contributes its 3 edges to
    ``triangle_structure``; counting wedges exactly needs values, so this
    routine counts via a scipy value product on the masked structure's support
    (host-side; the structure filter is the TPU part).
    """
    sp = a.to_scipy().astype(np.int64)
    prod = sp @ sp
    tri = prod.multiply(sp)
    return int(tri.sum()) // 6
