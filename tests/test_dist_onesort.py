"""SPMD one-sort closure (parallel/dist_onesort.py) on the virtual CPU mesh."""
import numpy as np
import pytest

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops.graph import transitive_closure
from binary_spgemm_tpu.parallel.dist_onesort import dist_transitive_closure
from binary_spgemm_tpu.parallel.mesh import make_row_mesh


@pytest.mark.parametrize("nd", [2, 8])
def test_dist_closure_matches_host(nd):
    mesh = make_row_mesh(nd)
    a = BCSR.random(50 * nd, 50 * nd, 1.2, seed=4).sum_duplicates()
    want = transitive_closure(a)
    got = dist_transitive_closure(a, mesh)
    assert got.equals(want)


def test_dist_closure_nondivisible_rows():
    mesh = make_row_mesh(8)
    a = BCSR.random(203, 203, 1.5, seed=5).sum_duplicates()
    want = transitive_closure(a)
    got = dist_transitive_closure(a, mesh)
    assert got.equals(want)


def test_dist_closure_compact_gate():
    from binary_spgemm_tpu.parallel import dist_onesort as mod

    mesh = make_row_mesh(4)
    a = BCSR.random(160, 160, 1.5, seed=6).sum_duplicates()
    want = transitive_closure(a)
    old = mod.ONESORT_COMPACT_RATIO
    try:
        mod.ONESORT_COMPACT_RATIO = 0.0  # compact every round
        got = dist_transitive_closure(a, mesh)
    finally:
        mod.ONESORT_COMPACT_RATIO = old
    assert got.equals(want)


def test_dist_closure_max_iters_partial():
    mesh = make_row_mesh(4)
    a = BCSR.random(120, 120, 1.0, seed=7).sum_duplicates()
    # one round == R OR R·R
    want = transitive_closure(a, max_iters=1)
    got = dist_transitive_closure(a, mesh, max_iters=1)
    assert got.equals(want)


def test_dist_closure_overflow_guard():
    from binary_spgemm_tpu.parallel import dist_onesort as mod

    mesh = make_row_mesh(2)
    a = BCSR.random(500, 500, 4.0, seed=8).sum_duplicates()
    old = mod.DEVICE_CLOSURE_MAX_FLOPS
    try:
        mod.DEVICE_CLOSURE_MAX_FLOPS = 100
        with pytest.raises(OverflowError):
            dist_transitive_closure(a, mesh)
    finally:
        mod.DEVICE_CLOSURE_MAX_FLOPS = old


@pytest.mark.parametrize("nd", [2, 8])
def test_dist_k_hop_matches_host(nd):
    from binary_spgemm_tpu.ops.graph import k_hop
    from binary_spgemm_tpu.parallel.dist_onesort import dist_k_hop

    mesh = make_row_mesh(nd)
    a = BCSR.random(40 * nd + 3, 40 * nd + 3, 2.0, seed=12).sum_duplicates()
    for k in (1, 2, 3, 5):
        assert dist_k_hop(a, mesh, k).equals(k_hop(a, k))


def test_dist_k_hop_validation():
    from binary_spgemm_tpu.parallel.dist_onesort import dist_k_hop

    mesh = make_row_mesh(2)
    a = BCSR.random(60, 60, 2.0, seed=13)
    with pytest.raises(ValueError):
        dist_k_hop(a, mesh, 0)
    rect = BCSR.random(40, 60, 2.0, seed=14)
    with pytest.raises(ValueError):
        dist_k_hop(rect, mesh, 2)
