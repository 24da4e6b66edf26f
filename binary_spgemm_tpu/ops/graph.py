"""Graph-algorithm conveniences over the boolean SpGEMM core.

The reference computes C = A·A on graph adjacency patterns (its benchmark
inputs are sprand adjacency matrices); these helpers package the standard uses
of that primitive — k-hop reachability, transitive closure, and triangle
structure (the canonical masked-SpGEMM application) — as first-class ops.
All reuse the ESC engine, so they inherit bit-exactness and chunking.
"""
from __future__ import annotations

import functools

import numpy as np

from ..formats.bcsr import BCSR
from .fused import spgemm_or
from .masked import masked_spgemm
from .spgemm import spgemm

__all__ = [
    "k_hop",
    "transitive_closure",
    "triangle_structure",
    "triangle_count",
    "bfs_levels",
    "reachable",
    "clustering_coefficients",
    "k_truss",
]


def k_hop(
    a: BCSR,
    k: int,
    *,
    chunk_flops: int | None = None,
    device: bool = False,
    one_sort: bool = True,
) -> BCSR:
    """Structure of A^k (nodes reachable in exactly ≤k-hop products).

    Computed by binary exponentiation — log2(k) SpGEMMs.  ``device=True``
    keeps the running power and result in HBM between products (see
    :func:`transitive_closure`); raises OverflowError past the resident
    whole-matrix flop budget.  ``one_sort`` (device path only, default on)
    chains the products through uncompacted sentinel-holed streams
    (:mod:`.onesort`) — each product pays ONE sort instead of two; set
    False for the compacted rounds.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if device:
        if one_sort:
            return _k_hop_device_onesort(a, k)
        return _k_hop_device(a, k)
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
    a: BCSR,
    *,
    max_iters: int | None = None,
    chunk_flops: int | None = None,
    device: bool = False,
    one_sort: bool = True,
) -> BCSR:
    """Reachability closure: OR of A, A², A⁴, ... until fixpoint.

    Doubling iteration: R ← R OR R·R; converges in ⌈log2(diameter)⌉ rounds.

    ``device=True`` keeps R resident in HBM between rounds: the host syncs
    two scalars per round instead of pulling each intermediate — the win
    whenever the device→host link is slow relative to compute, or when the
    closure feeds further device-resident ops.  ``one_sort`` (default on)
    runs those rounds on the uncompacted one-sort contract
    (:mod:`.onesort`): R carries its demoted duplicates as sentinel holes
    into the next round's gather and D-seed, so every round pays ONE sort
    instead of sort+compaction (the round-4 measured −24..50% device-time
    lever, ab="one-sort"); a ratio gate compacts only when holes compound
    past profit.  ``one_sort=False`` keeps the compacted rounds
    (:func:`..device_api.spgemm_or_device` + between-round compact).
    Raises OverflowError when a round's flop bound exceeds the resident
    whole-matrix budget (use the chunked host path then).
    """
    if a.n_rows != a.n_cols:
        raise ValueError("closure needs a square matrix")
    if device:
        if one_sort:
            return _transitive_closure_device_onesort(a, max_iters)
        return _transitive_closure_device(a, max_iters)
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


# Flop-bound cap for one resident whole-matrix fused step: ~24 B/slot of
# sort intermediates => 2^28 slots ~ 6.4 GB transient on a 16 GB chip.
DEVICE_CLOSURE_MAX_FLOPS = 1 << 28


@functools.cache
def _step_bound_jit():
    import jax
    import jax.numpy as jnp

    from .spgemm import INT

    @jax.jit
    def step_bound(indptr, indices, nnz):
        # int32 flop bound + a float32 overflow sentinel (int32 sums wrap
        # silently; fp32 keeps ~7 digits — plenty for a threshold test)
        valid = jnp.arange(indices.shape[0], dtype=INT) < nnz
        acol = jnp.where(valid, indices, 0)
        blen = jnp.where(valid, indptr[acol + 1] - indptr[acol], 0)
        return jnp.sum(blen, dtype=INT), jnp.sum(blen.astype(jnp.float32))

    return step_bound


def _transitive_closure_device(a: BCSR, max_iters: int | None) -> BCSR:
    from .device_api import spgemm_or_device
    from .spgemm import DeviceBCSR, require_int32_operands

    require_int32_operands(a)
    step_bound = _step_bound_jit()
    r = DeviceBCSR.from_host(a.sum_duplicates())
    iters = max_iters if max_iters is not None else max(1, a.n_rows.bit_length())
    prev_nnz = int(r.nnz)
    for _ in range(iters):
        nxt = spgemm_or_device(
            r, r, r, flops_pad=_guarded_flops_pad(step_bound, r, r)
        )
        nnz = int(nxt.nnz)
        if nnz == prev_nnz:
            # nxt = R OR (R·R) is a superset of R; equal nnz => fixpoint
            break
        prev_nnz = nnz
        r = nxt.compact()
    return r.to_host()


# Compact a one-sort stream between rounds once holes push its length past
# this multiple of its valid count.  Cost math: a one-sort round sorts
# (flops·h + stream) slots vs the compact pipeline's 2·(flops + nnz_d); with
# in-span hole ratio h = stream/nnz the one-sort round is cheaper while
# h ≲ 2, and the compaction itself costs one stream-length sort — so the
# gate sits where the next round's guaranteed saving pays for it.
ONESORT_COMPACT_RATIO = 2.0


def _onesort_guarded_pad(r, s) -> int:
    """Padded-span flop bound for one one-sort product r·s, raising past the
    resident budget (mirrors :func:`_guarded_flops_pad`)."""
    from .onesort import flops_bound_onesort
    from .spgemm import pad_bucket

    fb, est = flops_bound_onesort(r, s)
    if float(est) > 0.98 * DEVICE_CLOSURE_MAX_FLOPS:
        raise OverflowError(
            f"padded product flop bound ~{float(est):.3g} exceeds the "
            f"resident budget {DEVICE_CLOSURE_MAX_FLOPS}; use the chunked "
            "host path (device=False) or one_sort=False"
        )
    return pad_bucket(max(int(fb), 8))


def _onesort_regate(r):
    """Between-round hole gate: ONE compaction sort when the stream has
    grown past :data:`ONESORT_COMPACT_RATIO` × its valid count."""
    from .onesort import PaddedDeviceBCSR

    if r.stream_len > ONESORT_COMPACT_RATIO * max(int(r.nnz), 1):
        return PaddedDeviceBCSR.from_device(r.compact())
    return r


def _transitive_closure_device_onesort(a: BCSR, max_iters: int | None) -> BCSR:
    from .onesort import PaddedDeviceBCSR, spgemm_or_onesort_device
    from .spgemm import require_int32_operands

    require_int32_operands(a)
    r = PaddedDeviceBCSR.from_host(a.sum_duplicates())
    iters = max_iters if max_iters is not None else max(1, a.n_rows.bit_length())
    prev_nnz = int(r.nnz)
    for _ in range(iters):
        nxt = spgemm_or_onesort_device(
            r, r, r, flops_pad=_onesort_guarded_pad(r, r)
        )
        nnz = int(nxt.nnz)
        if nnz == prev_nnz:
            # nxt = R OR (R·R) is a superset of R; equal nnz => fixpoint
            break
        prev_nnz = nnz
        r = _onesort_regate(nxt)
    return r.to_host()


def _k_hop_device_onesort(a: BCSR, k: int) -> BCSR:
    from .onesort import PaddedDeviceBCSR, spgemm_onesort_device
    from .spgemm import require_int32_operands

    require_int32_operands(a)

    def prod(x, y):
        return _onesort_regate(
            spgemm_onesort_device(x, y, flops_pad=_onesort_guarded_pad(x, y))
        )

    result = None
    power = PaddedDeviceBCSR.from_host(a.sum_duplicates())
    while k:
        if k & 1:
            result = power if result is None else prod(result, power)
        k >>= 1
        if k:
            power = prod(power, power)
    return result.to_host()


def _guarded_flops_pad(step_bound, x, y) -> int:
    """Flop-bound pad for one resident product x·y, raising past the
    whole-matrix budget (shared by the device k-hop and closure loops)."""
    from .spgemm import pad_bucket

    fb, est = step_bound(y.indptr, x.indices, x.nnz)
    if float(est) > 0.98 * DEVICE_CLOSURE_MAX_FLOPS:
        raise OverflowError(
            f"product flop bound ~{float(est):.3g} exceeds the resident "
            f"budget {DEVICE_CLOSURE_MAX_FLOPS}; use the chunked host path "
            "(device=False)"
        )
    return pad_bucket(max(int(fb), 8))


def _device_product(x, y, step_bound):
    from .device_api import spgemm_device

    return spgemm_device(
        x, y, flops_pad=_guarded_flops_pad(step_bound, x, y)
    ).compact()


def _k_hop_device(a: BCSR, k: int) -> BCSR:
    from .spgemm import DeviceBCSR, require_int32_operands

    require_int32_operands(a)
    step_bound = _step_bound_jit()
    result = None
    power = DeviceBCSR.from_host(a.sum_duplicates())
    while k:
        if k & 1:
            result = (
                power
                if result is None
                else _device_product(result, power, step_bound)
            )
        k >>= 1
        if k:
            power = _device_product(power, power, step_bound)
    return result.to_host()


def clustering_coefficients(
    a: BCSR, *, chunk_flops: int | None = None
) -> np.ndarray:
    """Local clustering coefficient per node of the undirected simple graph
    with (symmetric, hollow) adjacency A: triangles_at(v) / C(deg(v), 2).

    triangles_at(v) = half the row sum of the per-edge common-neighbor
    counts (:func:`.counts.masked_spgemm_counts` with F = A = A); nodes of
    degree < 2 get 0.  Returns float64[n].
    """
    if a.n_rows != a.n_cols:
        raise ValueError("clustering needs a square adjacency matrix")
    from .counts import masked_spgemm_counts

    a = a.sum_duplicates()
    c, counts = masked_spgemm_counts(a, a, a, chunk_flops=chunk_flops)
    rows = np.repeat(
        np.arange(a.n_rows, dtype=np.int64), np.diff(c.indptr)
    )
    tri2 = np.zeros(a.n_rows, np.int64)  # 2 * triangles_at(v)
    np.add.at(tri2, rows, counts)
    deg = np.diff(a.indptr).astype(np.int64)
    pairs = deg * (deg - 1)  # 2 * C(deg, 2)
    out = np.zeros(a.n_rows, np.float64)
    nz = pairs > 0
    out[nz] = tri2[nz] / pairs[nz]
    return out


def k_truss(a: BCSR, k: int, *, chunk_flops: int | None = None) -> BCSR:
    """The k-truss of the undirected simple graph with (symmetric, hollow)
    adjacency A: the maximal subgraph whose every edge lies in ≥ k-2
    triangles within the subgraph.

    Standard peeling: per round, per-edge common-neighbor counts
    (:func:`.counts.masked_spgemm_counts` with F = G = G) drop every edge
    with support < k-2; repeat until stable.  k=3 keeps exactly the edges in
    at least one triangle (≡ the GraphChallenge k-truss kernel).
    """
    if k < 3:
        raise ValueError("k-truss needs k >= 3")
    if a.n_rows != a.n_cols:
        raise ValueError("k-truss needs a square adjacency matrix")
    from .counts import masked_spgemm_counts

    g = a.sum_duplicates()
    need = k - 2
    while g.nnz:
        c, counts = masked_spgemm_counts(g, g, g, chunk_flops=chunk_flops)
        # edges of g absent from c have support 0; survivors need >= k-2
        rows, cols = c.to_coo()
        keep = counts >= need
        nxt = BCSR.from_coo(rows[keep], cols[keep], g.shape)
        if nxt.nnz == g.nnz:
            return g
        g = nxt
    return g


def bfs_levels(
    a: BCSR,
    sources,
    *,
    max_hops: int | None = None,
    chunk_flops: int | None = None,
) -> np.ndarray:
    """BFS hop levels from a source set over the directed graph with
    adjacency A (edge i→j when A[i, j] is set).

    Returns ``int32[n]``: sources get 0, a node first reached after ``k``
    frontier expansions gets ``k``, unreachable nodes get ``-1``.

    Each round multiplies the current frontier — a 1×n pattern row — by A
    on device (the row-slice kernel at slice height 1, ≡ SpGEMM_bigslice
    with end_row-start_row=1, final/SpGEMM_mpi_omp.c:15-58) and the host
    peels the never-seen columns off the product row, so every edge out of
    a node is traversed exactly once across the whole search.
    """
    if a.n_rows != a.n_cols:
        raise ValueError("bfs needs a square adjacency matrix")
    n = a.n_rows
    src = np.unique(np.atleast_1d(np.asarray(sources, dtype=np.int64)))
    if src.size == 0:
        raise ValueError("sources must be non-empty")
    if src[0] < 0 or src[-1] >= n:
        raise ValueError(f"source ids must be in [0, {n}); got {sources!r}")

    level = np.full(n, -1, dtype=np.int32)
    level[src] = 0
    frontier = src.astype(np.int32)  # ascending & unique, BCSR-canonical
    hops = n if max_hops is None else max_hops
    lvl = 0
    while frontier.size and lvl < hops:
        lvl += 1
        f = BCSR(
            np.array([0, frontier.size], dtype=np.int32), frontier, (1, n)
        )
        prod = spgemm(f, a, chunk_flops=chunk_flops)
        cand = prod.indices  # ascending, deduped
        frontier = cand[level[cand] < 0]
        level[frontier] = lvl
    return level


def reachable(
    a: BCSR,
    sources,
    *,
    max_hops: int | None = None,
    chunk_flops: int | None = None,
) -> np.ndarray:
    """Sorted ids of nodes reachable from the source set (sources included),
    optionally within ``max_hops`` edge traversals.  See :func:`bfs_levels`."""
    lv = bfs_levels(a, sources, max_hops=max_hops, chunk_flops=chunk_flops)
    return np.flatnonzero(lv >= 0).astype(np.int32)


def triangle_structure(a: BCSR, *, chunk_flops: int | None = None) -> BCSR:
    """Edges (i, j) of A that close at least one triangle: A .* (A·A).

    The canonical masked-SpGEMM workload (≡ SpGEMM_masked with F = A,
    final/SpGEMM_mpi_omp.c:232-288).
    """
    if a.n_rows != a.n_cols:
        raise ValueError("triangles need a square matrix")
    return masked_spgemm(a, a, a, chunk_flops=chunk_flops)


def triangle_count(
    a: BCSR, *, chunk_flops: int | None = None, device: bool = True
) -> int:
    """Number of triangles in the undirected simple graph with adjacency A
    (symmetric, empty diagonal): Σ_{(i,j)∈A} |N(i) ∩ N(j)| / 6.

    ``device=True`` (default) runs the masked counting kernel on device
    (:func:`.counts.triangle_count_device` — each chunk returns one scalar,
    no index arrays leave the device); ``device=False`` is the scipy host
    oracle (an int64 value product masked to A's support).
    """
    if device:
        from .counts import triangle_count_device

        return triangle_count_device(a, chunk_flops=chunk_flops)
    sp = a.to_scipy().astype(np.int64)
    prod = sp @ sp
    tri = prod.multiply(sp)
    return int(tri.sum()) // 6
