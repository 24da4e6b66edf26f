"""One-sort device-resident pipeline (ops/onesort.py): bit-exactness of the
uncompacted sentinel-holed streams against the scipy oracle, including
consumption of hole-y operands (the whole point of the contract)."""
import numpy as np
import pytest

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops.onesort import (
    PaddedDeviceBCSR,
    flops_bound_onesort,
    spgemm_onesort_device,
    spgemm_or_onesort_device,
)
from binary_spgemm_tpu.ops.spgemm import DeviceBCSR
from binary_spgemm_tpu.utils.oracle import spgemm_oracle


def _pad_of(mat: BCSR) -> PaddedDeviceBCSR:
    return PaddedDeviceBCSR.from_host(mat.sum_duplicates())


def _product(a, b):
    fb, _ = flops_bound_onesort(a, b)
    return spgemm_onesort_device(a, b, flops_pad=max(int(fb), 8))


@pytest.mark.parametrize("n,d", [(500, 3.0), (2000, 5.0)])
def test_onesort_product_matches_oracle(n, d):
    a = BCSR.random(n, n, d, seed=1).sum_duplicates()
    c = _product(_pad_of(a), _pad_of(a))
    assert c.to_host().equals(spgemm_oracle(a, a))


def test_onesort_nonpackable_branch():
    # n_cols large enough that (row, col) does not pack into one int32
    n = 700
    a = BCSR.random(n, 1 << 22, 2.0, seed=2).sum_duplicates()
    b = BCSR.random(1 << 22, n, 0.0005, seed=3).sum_duplicates()
    from binary_spgemm_tpu.ops.spgemm import packable

    assert not packable(n, 1 << 22)
    c = _product(_pad_of(a), _pad_of(b))
    assert c.to_host().equals(spgemm_oracle(a, b))


def test_onesort_consumes_holey_operands():
    # chain TWO products through the padded stream: the second consumes the
    # first's holes (demoted duplicates) without any compaction
    a = BCSR.random(800, 800, 4.0, seed=4).sum_duplicates()
    p1 = _product(_pad_of(a), _pad_of(a))  # a² with holes
    assert p1.stream_len > int(p1.nnz)  # there ARE holes to consume
    p2 = _product(p1, p1)  # a⁴ through hole-y both sides
    a2 = spgemm_oracle(a, a)
    assert p2.to_host().equals(spgemm_oracle(a2, a2))


def test_onesort_fused_or_matches_composition():
    a = BCSR.random(600, 600, 4.0, seed=5).sum_duplicates()
    d = BCSR.random(600, 600, 2.0, seed=6).sum_duplicates()
    from binary_spgemm_tpu.ops.onesort import flops_bound_onesort as fb

    pa, pd = _pad_of(a), _pad_of(d)
    bound, _ = fb(pa, pa)
    c = spgemm_or_onesort_device(pd, pa, pa, flops_pad=max(int(bound), 8))
    want = spgemm_oracle(a, a).to_scipy() + d.to_scipy()
    want = BCSR.from_scipy((want > 0).tocsr())
    assert c.to_host().equals(want)


def test_onesort_or_with_holey_seed():
    # D itself is a hole-y stream (a previous product) — the seed join must
    # dedup its holes away like any sentinel
    a = BCSR.random(600, 600, 3.0, seed=7).sum_duplicates()
    pa = _pad_of(a)
    d = _product(pa, pa)  # hole-y a²
    bound, _ = flops_bound_onesort(pa, pa)
    c = spgemm_or_onesort_device(d, pa, pa, flops_pad=max(int(bound), 8))
    a2 = spgemm_oracle(a, a)
    assert c.to_host().equals(a2)  # a² OR a² = a²


def test_padded_compact_and_roundtrip():
    a = BCSR.random(700, 700, 4.0, seed=8).sum_duplicates()
    p = _product(_pad_of(a), _pad_of(a))
    want = spgemm_oracle(a, a)
    # host pull of the padded stream
    assert p.to_host().equals(want)
    # device compaction → DeviceBCSR → host
    dev = p.compact()
    assert isinstance(dev, DeviceBCSR)
    assert dev.to_host().equals(want)
    # re-wrap compact as padded (free) and multiply again
    rw = PaddedDeviceBCSR.from_device(dev)
    p2 = _product(rw, rw)
    assert p2.to_host().equals(spgemm_oracle(want, want))


def test_closure_onesort_matches_host_and_compact():
    from binary_spgemm_tpu.ops.graph import transitive_closure

    # a sparse digraph with real multi-hop structure
    a = BCSR.random(400, 400, 1.5, seed=9).sum_duplicates()
    want = transitive_closure(a)  # chunked host path (oracle-pinned already)
    got_compact = transitive_closure(a, device=True, one_sort=False)
    got_onesort = transitive_closure(a, device=True, one_sort=True)
    assert got_compact.equals(want)
    assert got_onesort.equals(want)


def test_khop_onesort_matches():
    from binary_spgemm_tpu.ops.graph import k_hop

    a = BCSR.random(500, 500, 2.0, seed=10).sum_duplicates()
    for k in (1, 2, 3, 5):
        want = k_hop(a, k)
        assert k_hop(a, k, device=True, one_sort=True).equals(want)


def test_onesort_compact_ratio_gate():
    # force the between-round compaction: tiny gate → every round compacts;
    # result must not change
    from binary_spgemm_tpu.ops import graph

    a = BCSR.random(300, 300, 2.0, seed=11).sum_duplicates()
    want = graph.transitive_closure(a)
    old = graph.ONESORT_COMPACT_RATIO
    try:
        graph.ONESORT_COMPACT_RATIO = 0.0
        got = graph.transitive_closure(a, device=True, one_sort=True)
    finally:
        graph.ONESORT_COMPACT_RATIO = old
    assert got.equals(want)


def test_onesort_overflow_guard():
    from binary_spgemm_tpu.ops import graph

    a = BCSR.random(2000, 2000, 8.0, seed=12).sum_duplicates()
    old = graph.DEVICE_CLOSURE_MAX_FLOPS
    try:
        graph.DEVICE_CLOSURE_MAX_FLOPS = 1000
        with pytest.raises(OverflowError):
            graph.transitive_closure(a, device=True, one_sort=True)
    finally:
        graph.DEVICE_CLOSURE_MAX_FLOPS = old


def test_empty_and_shape_checks():
    e = BCSR(np.zeros(11, np.int32), np.zeros(0, np.int32), (10, 10))
    p = _pad_of(e)
    c = _product(p, p)
    assert c.to_host().nnz == 0
    b = _pad_of(BCSR.random(20, 30, 2.0, seed=13))
    with pytest.raises(ValueError):
        spgemm_onesort_device(b, b, flops_pad=8)
    with pytest.raises(TypeError):
        spgemm_onesort_device("nope", b, flops_pad=8)


def test_onesort_masked_fused_matches_oracle():
    # D OR (F .* (A·B)) through one sort — both key branches
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle

    a = BCSR.random(600, 600, 4.0, seed=20).sum_duplicates()
    d = BCSR.random(600, 600, 2.0, seed=21).sum_duplicates()
    f = BCSR.random(600, 600, 3.0, seed=22).sum_duplicates()
    pa, pd, pf = _pad_of(a), _pad_of(d), _pad_of(f)
    bound, _ = flops_bound_onesort(pa, pa)
    c = spgemm_or_onesort_device(
        pd, pa, pa, flops_pad=max(int(bound), 8), mask=pf
    )
    want = masked_spgemm_oracle(f, a, a).to_scipy() + d.to_scipy()
    want = BCSR.from_scipy((want > 0).tocsr())
    assert c.to_host().equals(want)


def test_onesort_masked_nonpackable_branch():
    from binary_spgemm_tpu.ops.spgemm import packable
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle

    n, m = 600, 1 << 22
    assert not packable(n, 4 * m + 3)
    a = BCSR.random(n, m, 2.0, seed=23).sum_duplicates()
    b = BCSR.random(m, m, 0.0005, seed=24).sum_duplicates()
    d = BCSR.random(n, m, 1.0, seed=25).sum_duplicates()
    f = BCSR.random(n, m, 2.0, seed=26).sum_duplicates()
    pa, pb, pd, pf = _pad_of(a), _pad_of(b), _pad_of(d), _pad_of(f)
    bound, _ = flops_bound_onesort(pa, pb)
    c = spgemm_or_onesort_device(
        pd, pa, pb, flops_pad=max(int(bound), 8), mask=pf
    )
    want = masked_spgemm_oracle(f, a, b).to_scipy() + d.to_scipy()
    want = BCSR.from_scipy((want > 0).tocsr())
    assert c.to_host().equals(want)


def test_onesort_masked_holey_operands_and_chain():
    # mask AND seed are hole-y streams (previous products); the masked
    # round's output chains into a further unmasked round
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle

    a = BCSR.random(500, 500, 3.0, seed=27).sum_duplicates()
    pa = _pad_of(a)
    p2 = _product(pa, pa)  # hole-y a² — serves as both mask and seed
    bound, _ = flops_bound_onesort(pa, pa)
    c = spgemm_or_onesort_device(
        p2, pa, pa, flops_pad=max(int(bound), 8), mask=p2
    )
    a2 = spgemm_oracle(a, a)
    # a² OR (a² .* a²) = a²
    assert c.to_host().equals(a2)
    assert c.stream_len > int(c.nnz)  # mask entries became in-span holes
    nxt = _product(c, c)  # the masked output consumed downstream
    assert nxt.to_host().equals(spgemm_oracle(a2, a2))


def test_onesort_masked_shape_check():
    a = _pad_of(BCSR.random(40, 40, 2.0, seed=28))
    bad = _pad_of(BCSR.random(30, 30, 2.0, seed=29))
    with pytest.raises(ValueError):
        spgemm_or_onesort_device(a, a, a, flops_pad=8, mask=bad)
