"""int64 output domain: products with nnz(C) above the int32 row-pointer
range get two-level assembly (int32 chunk-local device pointers + int64 host
bases → int64 ``indptr``), while multiply *operands* stay guarded to the
int32 device index domain (OverflowError, never a silent wrap — the
reference's `int` nnz wraps past INT_MAX).

Exercised by lowering ``bcsr.INDPTR_INT32_MAX`` (the promotion threshold) so
small matrices take the giant-output code paths.
"""
import numpy as np
import pytest

from binary_spgemm_tpu import BCSR, masked_spgemm, spgemm, spm_or
from binary_spgemm_tpu.formats import bcsr as bcsr_mod
from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor
from binary_spgemm_tpu.ops.spgemm import require_int32_operands
from binary_spgemm_tpu.parallel.dist_spgemm import dist_spgemm, make_row_mesh
from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle, spgemm_oracle


@pytest.fixture
def tiny_limit(monkeypatch):
    # outputs beyond 64 nnz now count as "giant" and must promote to int64
    monkeypatch.setattr(bcsr_mod, "INDPTR_INT32_MAX", 64)


def test_indptr_promotes_and_demotes(tiny_limit):
    big = BCSR.random(40, 40, 4.0, seed=1)
    assert big.nnz > 64
    assert big.indptr.dtype == np.int64
    small = BCSR.random(10, 10, 0.5, seed=1)
    assert small.nnz <= 64
    assert small.indptr.dtype == np.int32
    # explicit int64 construction demotes when it fits
    again = BCSR(small.indptr.astype(np.int64), small.indices, small.shape)
    assert again.indptr.dtype == np.int32 and again.equals(small)


def test_from_scipy_roundtrip_giant(tiny_limit):
    a = BCSR.random(30, 30, 5.0, seed=2)
    assert a.indptr.dtype == np.int64
    rt = BCSR.from_scipy(a.to_scipy())
    assert rt.indptr.dtype == np.int64 and rt.equals(a)


@pytest.mark.parametrize("engine", ["ell", "esc"])
def test_spgemm_giant_output_bit_exact(tiny_limit, engine):
    a = BCSR.random(200, 200, 3.0, seed=3)
    if engine == "ell":
        ex = EllSpGEMMExecutor(a, a)
        c = ex.assemble(ex.run())
    else:
        c = spgemm(a, a, chunk_flops=1 << 10)  # force chunked ESC
    assert c.indptr.dtype == np.int64
    assert c.equals(spgemm_oracle(a, a))


def test_spgemm_giant_output_dealt_plan(tiny_limit):
    a = BCSR.rmat(8, 4.0, seed=4)  # skewed → dealt (non-contiguous) stitch
    ex = EllSpGEMMExecutor(a, a, row_chunks="deal")
    c = ex.assemble(ex.run())
    assert c.indptr.dtype == np.int64
    assert c.equals(spgemm_oracle(a, a))


def test_masked_giant_output(tiny_limit):
    a = BCSR.random(150, 150, 3.0, seed=5)
    f = BCSR.random(150, 150, 40.0, seed=6)
    c = masked_spgemm(f, a, a)
    assert c.nnz > 64 and c.indptr.dtype == np.int64
    assert c.equals(masked_spgemm_oracle(f, a, a))


def test_spm_or_giant_output(tiny_limit):
    a = BCSR.random(100, 100, 2.0, seed=7)
    b = BCSR.random(100, 100, 2.0, seed=8)
    c = spm_or(a, b)
    ref = BCSR.from_scipy(
        ((a.to_scipy() + b.to_scipy()) != 0).astype(np.int64)
    )
    assert c.indptr.dtype == np.int64
    assert c.equals(ref)


@pytest.mark.parametrize("layout", ["replicated", "sharded", "ring"])
def test_dist_giant_output(tiny_limit, layout):
    # host assembly must rebuild pointers from shard-local diffs, immune to
    # any device-side int32 wrap of the global prefix fix
    a = BCSR.random(330, 330, 4.0, seed=9)
    c = dist_spgemm(a, a, make_row_mesh(), b_layout=layout)
    assert c.indptr.dtype == np.int64
    assert c.equals(spgemm_oracle(a, a))


def test_operand_guard_raises():
    a = BCSR.random(20, 20, 2.0, seed=10)

    class FakeGiant:
        nnz = 1 << 31

    with pytest.raises(OverflowError, match="operand nnz"):
        require_int32_operands(a, FakeGiant())
