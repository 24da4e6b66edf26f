import numpy as np
import pytest

from binary_spgemm_tpu import BCSR, spgemm, spm_or, masked_spgemm
from binary_spgemm_tpu.ops.fused import spgemm_or
from binary_spgemm_tpu.utils.oracle import spgemm_oracle


def oracle_dor(d, a, b):
    return (
        (d.to_scipy() + a.to_scipy() @ b.to_scipy()).tocsr()
    )


@pytest.mark.parametrize("seed", range(3))
def test_dor_random(seed):
    a = BCSR.random(200, 200, 4.0, seed=seed)
    d = BCSR.random(200, 200, 3.0, seed=seed + 10)
    c = spgemm_or(d, a, a)
    ref = oracle_dor(d, a, a)
    ref.sort_indices()
    expected = BCSR(ref.indptr, ref.indices, ref.shape)
    assert c.equals(expected)
    # and equals the two-op composition
    assert c.equals(spm_or(d, spgemm(a, a)))


def test_dor_empty_d():
    a = BCSR.random(100, 100, 3.0, seed=0)
    d = BCSR.from_dense(np.zeros((100, 100)))
    assert spgemm_or(d, a, a).equals(spgemm_oracle(a, a))


def test_dor_empty_product():
    a = BCSR.from_dense(np.zeros((50, 50)))
    d = BCSR.random(50, 50, 2.0, seed=1)
    assert spgemm_or(d, a, a).equals(d.sum_duplicates())


def test_dor_masked():
    # ≡ SpGEMM_dor_masked: D passes through, A*B is masked
    a = BCSR.random(150, 150, 4.0, seed=2)
    d = BCSR.random(150, 150, 2.0, seed=3)
    f = BCSR.random(150, 150, 6.0, seed=4)
    c = spgemm_or(d, a, a, mask=f)
    expected = spm_or(d, masked_spgemm(f, a, a))
    assert c.equals(expected)


def test_dor_chunked():
    a = BCSR.random(300, 300, 5.0, seed=5)
    d = BCSR.random(300, 300, 2.0, seed=6)
    c1 = spgemm_or(d, a, a)
    c2 = spgemm_or(d, a, a, chunk_flops=2048)
    assert c1.equals(c2)


def test_shape_errors():
    a = BCSR.random(10, 10, 1.0, seed=0)
    d = BCSR.random(11, 10, 1.0, seed=0)
    with pytest.raises(ValueError):
        spgemm_or(d, a, a)


def test_dor_engines_cross():
    # auto (sliced-ELL fused kernels) vs forced chunked ESC, plain + masked
    a = BCSR.random(300, 300, 5.0, seed=7)
    d = BCSR.random(300, 300, 2.0, seed=8)
    f = BCSR.random(300, 300, 4.0, seed=9)
    for kw in ({}, {"mask": f}):
        assert spgemm_or(d, a, a, **kw).equals(
            spgemm_or(d, a, a, chunk_flops=2048, **kw)
        )


def test_run_or_executor_paths():
    from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor

    a = BCSR.random(400, 400, 4.0, seed=11)
    d = BCSR.random(400, 400, 2.0, seed=12)
    f = BCSR.random(400, 400, 3.0, seed=13)
    ref = spm_or(d, spgemm(a, a))
    refm = spm_or(d, masked_spgemm(f, a, a))
    for rc in (5, "deal", 1):
        ex = EllSpGEMMExecutor(a, a, row_chunks=rc)
        assert ex.assemble(ex.run_or(d)).equals(ref)
        assert ex.assemble(ex.run_or(d, mask=f)).equals(refm)
    # staged-operand reuse (no per-call host prep)
    ex = EllSpGEMMExecutor(a, a, row_chunks=5, masked=True)
    sd, sf = ex.stage_mask(d), ex.stage_mask(f)
    assert ex.assemble(ex.run_or(sd)).equals(ref)
    assert ex.assemble(ex.run_or(sd, mask=sf)).equals(refm)


def test_run_or_multigroup(monkeypatch):
    # tiny dispatch budget forces several chunk groups + dummy-chunk padding
    import binary_spgemm_tpu.ops.ell as ell_mod

    monkeypatch.setattr(ell_mod, "DISPATCH_SLOT_BUDGET", 1 << 12)
    a = BCSR.random(500, 500, 4.0, seed=21)
    d = BCSR.random(500, 500, 2.0, seed=22)
    f = BCSR.random(500, 500, 3.0, seed=23)
    ex = ell_mod.EllSpGEMMExecutor(a, a, row_chunks=7)
    assert ex.n_groups > 1
    assert ex.assemble(ex.run_or(d)).equals(spm_or(d, spgemm(a, a)))
    assert ex.assemble(ex.run_or(d, mask=f)).equals(
        spm_or(d, masked_spgemm(f, a, a))
    )


def test_fused_masked_three_way_overlaps():
    """Pairs in all combinations of {D, mask, product} must follow
    C = D OR (F .* (A.B)) exactly."""
    import numpy as np
    from binary_spgemm_tpu import BCSR, spgemm_or
    from binary_spgemm_tpu.utils.oracle import spgemm_oracle

    rng = np.random.default_rng(3)
    for trial in range(6):
        n = int(rng.integers(20, 200))
        a = BCSR.random(n, n, 3.0, seed=trial)
        d = BCSR.random(n, n, 2.0, seed=trial + 50)
        f = BCSR.random(n, n, 2.5, seed=trial + 99)
        got = spgemm_or(d, a, a, mask=f)
        prod = spgemm_oracle(a, a).to_scipy()
        want = (d.to_scipy() + f.to_scipy().multiply(prod)).tocsr()
        want.sort_indices()
        want_b = BCSR.from_scipy(want)
        assert got.equals(want_b), trial
