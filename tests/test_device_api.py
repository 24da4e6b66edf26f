import jax

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops.spgemm import DeviceBCSR, pad_bucket, spgemm_flops
from binary_spgemm_tpu.ops.device_api import (
    flops_bound_device,
    spgemm_device,
    spm_or_device,
)
from binary_spgemm_tpu.utils.oracle import spgemm_oracle, union_oracle


def test_device_roundtrip():
    a = BCSR.random(100, 80, 3.0, seed=0)
    d = DeviceBCSR.from_host(a)
    assert d.to_host().equals(a)


def test_flops_bound_device():
    a = BCSR.random(200, 200, 4.0, seed=1)
    d = DeviceBCSR.from_host(a)
    assert int(flops_bound_device(d, d)) == spgemm_flops(a, a)


def test_spgemm_device_matches_oracle():
    a = BCSR.random(300, 300, 3.0, seed=2)
    d = DeviceBCSR.from_host(a)
    fp = pad_bucket(spgemm_flops(a, a))
    c = jax.jit(
        lambda x: spgemm_device(x, x, flops_pad=fp)
    )(d)
    assert c.to_host().equals(spgemm_oracle(a, a))


def test_device_chain_stays_on_device():
    # (A·A) OR A without any host sync in between
    a = BCSR.random(150, 150, 2.0, seed=3)
    d = DeviceBCSR.from_host(a)
    fp = pad_bucket(spgemm_flops(a, a))

    @jax.jit
    def chain(x):
        c = spgemm_device(x, x, flops_pad=fp)
        return spm_or_device(c, x)

    out = chain(d)
    expected = union_oracle(spgemm_oracle(a, a), a)
    assert out.to_host().equals(expected)


def test_spgemm_or_device_matches_oracle():
    from binary_spgemm_tpu.ops.device_api import spgemm_or_device
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle

    a = BCSR.random(250, 250, 3.0, seed=4)
    dm = BCSR.random(250, 250, 2.0, seed=5).sum_duplicates()
    f = BCSR.random(250, 250, 2.5, seed=6).sum_duplicates()
    da, dd, df = (DeviceBCSR.from_host(x) for x in (a, dm, f))
    fp = pad_bucket(spgemm_flops(a, a))
    out = spgemm_or_device(dd, da, da, flops_pad=fp)
    assert out.to_host().equals(union_oracle(dm, spgemm_oracle(a, a)))
    outm = spgemm_or_device(dd, da, da, flops_pad=fp, mask=df)
    assert outm.to_host().equals(
        union_oracle(dm, masked_spgemm_oracle(f, a, a))
    )


def test_masked_spgemm_device_matches_oracle():
    from binary_spgemm_tpu.ops.device_api import masked_spgemm_device
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle

    a = BCSR.random(250, 250, 3.0, seed=7)
    f = BCSR.random(250, 250, 2.0, seed=8).sum_duplicates()
    da, df = DeviceBCSR.from_host(a), DeviceBCSR.from_host(f)
    fp = pad_bucket(spgemm_flops(a, a))
    out = masked_spgemm_device(df, da, da, flops_pad=fp)
    assert out.to_host().equals(masked_spgemm_oracle(f, a, a))


def test_device_compact():
    a = BCSR.random(200, 200, 3.0, seed=9)
    d = DeviceBCSR.from_host(a, pad_to=pad_bucket(a.nnz) * 8)
    c = d.compact()
    assert c.indices.shape[0] < d.indices.shape[0]
    assert c.to_host().equals(a)
    assert d.compact(pad_to=d.indices.shape[0] * 2) is d  # no-op when wider


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_after_module():
    # The executables this module compiles push the in-process XLA CPU
    # compiler into a state where a LATER unrelated jit compile segfaults
    # (reproducible at tests/test_properties.py::test_engines_cross_parity_fuzz;
    # crash inside backend_compile_and_load, upstream compiler bug —
    # standalone runs of either module pass).  Dropping the cached
    # executables after the module avoids the state buildup.
    yield
    jax.clear_caches()


def test_device_compact_truncation_raises():
    a = BCSR.random(100, 100, 3.0, seed=10)
    d = DeviceBCSR.from_host(a)
    with pytest.raises(ValueError):
        d.compact(pad_to=8)


def test_spgemm_counts_device_matches_oracle():
    import numpy as np

    from binary_spgemm_tpu.ops.device_api import spgemm_counts_device

    a = BCSR.random(150, 120, 4.0, seed=8).sum_duplicates()
    b = BCSR.random(120, 160, 4.0, seed=9).sum_duplicates()
    da, db = DeviceBCSR.from_host(a), DeviceBCSR.from_host(b)
    fp = pad_bucket(spgemm_flops(a, b))
    dc, cnt = spgemm_counts_device(da, db, flops_pad=fp)
    c = dc.to_host()
    ref = (a.to_scipy().astype(np.int64) @ b.to_scipy().astype(np.int64)).tocsr()
    ref.sort_indices()
    np.testing.assert_array_equal(c.indptr, ref.indptr)
    np.testing.assert_array_equal(c.indices, ref.indices)
    np.testing.assert_array_equal(np.asarray(cnt)[: c.nnz], ref.data)


def test_counts_sum_device_is_wedge_sum():
    import numpy as np

    from binary_spgemm_tpu.ops.device_api import counts_sum_device

    a = BCSR.random(100, 100, 4.0, seed=3)
    sp = a.to_scipy()
    sp = ((sp + sp.T) > 0).astype(np.int64).tolil()
    sp.setdiag(0)
    g = BCSR.from_scipy(sp.tocsr())
    dg = DeviceBCSR.from_host(g)
    fp = pad_bucket(spgemm_flops(g, g))
    s = int(counts_sum_device(dg, dg, dg, flops_pad=fp))
    gi = g.to_scipy().astype(np.int64)
    assert s == int((gi @ gi).multiply(gi).sum())
    assert s % 6 == 0


def test_masked_spgemm_counts_device_matches_oracle():
    import numpy as np

    from binary_spgemm_tpu.ops.device_api import masked_spgemm_counts_device

    a = BCSR.random(90, 80, 4.0, seed=5).sum_duplicates()
    b = BCSR.random(80, 110, 4.0, seed=6).sum_duplicates()
    f = BCSR.random(90, 110, 6.0, seed=7).sum_duplicates()
    da, db, df = (DeviceBCSR.from_host(x) for x in (a, b, f))
    fp = pad_bucket(spgemm_flops(a, b))
    dc, cnt = masked_spgemm_counts_device(df, da, db, flops_pad=fp)
    c = dc.to_host()
    ref = (a.to_scipy().astype(np.int64) @ b.to_scipy().astype(np.int64))
    ref = ref.multiply(f.to_scipy().astype(bool)).tocsr()
    ref.sort_indices()
    ref.eliminate_zeros()
    np.testing.assert_array_equal(c.indptr, ref.indptr)
    np.testing.assert_array_equal(c.indices, ref.indices)
    np.testing.assert_array_equal(np.asarray(cnt)[: c.nnz], ref.data)


def test_from_host_require_canonical():
    import numpy as np
    import pytest

    dup = BCSR.from_coo(
        np.array([0, 0, 1]), np.array([2, 2, 1]), (2, 3)
    )  # duplicate (0,2)
    DeviceBCSR.from_host(dup)  # boolean family: fine
    with pytest.raises(ValueError, match="canonical"):
        DeviceBCSR.from_host(dup, require_canonical=True)
    DeviceBCSR.from_host(dup.sum_duplicates(), require_canonical=True)
