import numpy as np
import pytest

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops.graph import (
    k_hop,
    transitive_closure,
    triangle_count,
    triangle_structure,
)
from binary_spgemm_tpu.utils.oracle import spgemm_oracle


def ring(n):
    rows = np.arange(n)
    cols = (rows + 1) % n
    return BCSR.from_coo(rows, cols, (n, n))


def test_k_hop_ring():
    a = ring(10)
    for k in (1, 2, 3, 7):
        hk = k_hop(a, k)
        dense = np.zeros((10, 10), bool)
        dense[np.arange(10), (np.arange(10) + k) % 10] = True
        np.testing.assert_array_equal(hk.to_dense(), dense)


def test_k_hop_matches_iterated_oracle():
    a = BCSR.random(80, 80, 2.0, seed=1)
    c = spgemm_oracle(a, a)
    c3 = spgemm_oracle(c, a)
    assert k_hop(a, 3).equals(c3)
    with pytest.raises(ValueError):
        k_hop(a, 0)


def test_transitive_closure_ring():
    a = ring(8)
    tc = transitive_closure(a)
    # every node reaches every node (including itself via the full cycle)
    assert tc.nnz == 64


def test_transitive_closure_dag():
    # path graph 0->1->2->3: closure = strict upper triangle
    rows, cols = np.array([0, 1, 2]), np.array([1, 2, 3])
    a = BCSR.from_coo(rows, cols, (4, 4))
    tc = transitive_closure(a)
    expected = np.triu(np.ones((4, 4), bool), 1)
    np.testing.assert_array_equal(tc.to_dense(), expected)


def test_triangle_structure_and_count():
    # K4: every edge is in a triangle; 4 triangles
    dense = ~np.eye(4, dtype=bool)
    a = BCSR.from_dense(dense)
    ts = triangle_structure(a)
    np.testing.assert_array_equal(ts.to_dense(), dense)
    assert triangle_count(a) == 4

    # square (4-cycle): no triangles
    sq = np.zeros((4, 4), bool)
    for i in range(4):
        sq[i, (i + 1) % 4] = sq[(i + 1) % 4, i] = True
    b = BCSR.from_dense(sq)
    assert triangle_structure(b).nnz == 0
    assert triangle_count(b) == 0


def test_transitive_closure_device_matches_host():
    from binary_spgemm_tpu.ops.graph import transitive_closure

    for seed, n, d in [(11, 60, 1.5), (12, 200, 0.8), (13, 90, 2.5)]:
        a = BCSR.random(n, n, d, seed=seed)
        host = transitive_closure(a)
        dev = transitive_closure(a, device=True)
        assert dev.equals(host), (seed, n)
    # max_iters truncation agrees too
    a = BCSR.random(120, 120, 1.2, seed=14)
    assert transitive_closure(a, max_iters=2, device=True).equals(
        transitive_closure(a, max_iters=2)
    )


def test_transitive_closure_device_flop_guard(monkeypatch):
    import binary_spgemm_tpu.ops.graph as g

    monkeypatch.setattr(g, "DEVICE_CLOSURE_MAX_FLOPS", 64)
    a = BCSR.random(100, 100, 3.0, seed=15)
    import pytest

    with pytest.raises(OverflowError):
        g.transitive_closure(a, device=True)


import pytest as _pytest


@_pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_after_module():
    # see tests/test_device_api.py — same XLA CPU compiler-state workaround
    yield
    import jax

    jax.clear_caches()


def test_k_hop_device_matches_host():
    from binary_spgemm_tpu.ops.graph import k_hop

    for seed, n, d, k in [(21, 150, 2.0, 3), (22, 80, 1.5, 5), (23, 60, 3.0, 1)]:
        a = BCSR.random(n, n, d, seed=seed)
        assert k_hop(a, k, device=True).equals(k_hop(a, k)), (seed, k)


# ---- BFS / reachability ---------------------------------------------------


def _bfs_oracle(a: BCSR, sources):
    from scipy.sparse.csgraph import dijkstra

    dist = dijkstra(
        a.to_scipy(), directed=True, unweighted=True,
        indices=np.atleast_1d(sources), min_only=True,
    )
    lv = np.where(np.isinf(dist), -1, dist).astype(np.int32)
    return lv


def test_bfs_levels_ring():
    from binary_spgemm_tpu import bfs_levels

    lv = bfs_levels(ring(8), 3)
    np.testing.assert_array_equal(lv, [5, 6, 7, 0, 1, 2, 3, 4])


def test_bfs_levels_matches_csgraph():
    from binary_spgemm_tpu import bfs_levels

    for seed, n, d, srcs in [
        (31, 200, 1.5, 0),
        (32, 150, 0.5, [3, 77]),          # sparse: plenty unreachable
        (33, 120, 3.0, [0, 1, 2]),
        (34, 64, 2.0, [63]),
    ]:
        a = BCSR.random(n, n, d, seed=seed)
        np.testing.assert_array_equal(
            bfs_levels(a, srcs), _bfs_oracle(a, srcs), err_msg=str(seed)
        )


def test_bfs_levels_max_hops_and_reachable():
    from binary_spgemm_tpu import bfs_levels, reachable

    a = ring(10)
    lv = bfs_levels(a, 0, max_hops=3)
    np.testing.assert_array_equal(lv, [0, 1, 2, 3, -1, -1, -1, -1, -1, -1])
    np.testing.assert_array_equal(reachable(a, 0, max_hops=3), [0, 1, 2, 3])
    # full reach on a random graph = closure row support ∪ {source}
    b = BCSR.random(90, 90, 2.0, seed=41)
    want = np.flatnonzero(_bfs_oracle(b, 5) >= 0)
    np.testing.assert_array_equal(reachable(b, 5), want)


def test_bfs_levels_validation():
    from binary_spgemm_tpu import bfs_levels

    a = ring(6)
    with pytest.raises(ValueError, match="non-empty"):
        bfs_levels(a, [])
    with pytest.raises(ValueError, match="source ids"):
        bfs_levels(a, 6)
    with pytest.raises(ValueError, match="square"):
        bfs_levels(BCSR.random(4, 5, 1.0, seed=1), 0)


def test_bfs_levels_empty_adjacency():
    from binary_spgemm_tpu import bfs_levels

    a = BCSR(np.zeros(7, np.int32), np.zeros(0, np.int32), (6, 6))
    lv = bfs_levels(a, [2, 4])
    np.testing.assert_array_equal(lv, [-1, -1, 0, -1, 0, -1])
