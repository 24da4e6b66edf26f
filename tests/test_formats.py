import numpy as np
import pytest

from binary_spgemm_tpu import BCSR, coo_to_csr_stable


def test_coo_to_csr_stable_preserves_input_order():
    # Duplicate and out-of-order entries must keep file order within a row,
    # mirroring coo2csc's write-cursor scatter (final/coo2csc.c:48-56).
    rows = np.array([2, 0, 2, 0, 1, 2])
    cols = np.array([5, 3, 1, 9, 0, 5])
    indptr, indices = coo_to_csr_stable(rows, cols, 3)
    assert indptr.tolist() == [0, 2, 3, 6]
    assert indices.tolist() == [3, 9, 0, 5, 1, 5]  # stable, unsorted, with dup


def test_from_coo_transpose_matches_reference_semantics():
    # readCOO (final/utils.c:77) groups by the SECOND index and stores the FIRST:
    # the result is the CSR of the transpose of the input pairs.
    rows = np.array([0, 0, 1, 2])
    cols = np.array([1, 2, 0, 2])
    mat = BCSR.from_coo(rows, cols, (3, 3), transpose=True)
    dense = np.zeros((3, 3), bool)
    dense[rows, cols] = True
    np.testing.assert_array_equal(mat.to_dense(), dense.T)


def test_roundtrip_dense():
    rng = np.random.default_rng(0)
    dense = rng.random((17, 23)) < 0.2
    mat = BCSR.from_dense(dense)
    np.testing.assert_array_equal(mat.to_dense(), dense)
    np.testing.assert_array_equal(mat.transpose().to_dense(), dense.T)


def test_scipy_roundtrip():
    mat = BCSR.random(50, 40, 3.0, seed=7)
    back = BCSR.from_scipy(mat.to_scipy())
    assert mat.equals(back)


def test_random_density():
    mat = BCSR.random(2000, 2000, 4.0, seed=3)
    assert mat.nnz == pytest.approx(8000, rel=0.1)
    assert mat.indices.min() >= 0 and mat.indices.max() < 2000
    # canonical: random() dedupes via unique linear positions
    assert mat.sum_duplicates().nnz == mat.nnz


def test_sum_duplicates_and_sort():
    rows = np.array([0, 0, 0, 1])
    cols = np.array([5, 2, 5, 1])
    mat = BCSR.from_coo(rows, cols, (2, 8))
    canon = mat.sum_duplicates()
    assert canon.indptr.tolist() == [0, 2, 3]
    assert canon.indices.tolist() == [2, 5, 1]


def test_flops():
    a = BCSR.from_dense(np.array([[1, 1], [0, 1]]))
    b = BCSR.from_dense(np.array([[1, 0], [1, 1]]))
    # row0 of A hits B rows 0 (1 nnz) and 1 (2 nnz); row1 hits row 1 (2 nnz)
    assert a.flops(b) == 5


def test_validation_errors():
    with pytest.raises(ValueError):
        BCSR(np.array([0, 1]), np.array([0, 1]), (1, 2))  # indptr end != nnz


def test_rmat_generator():
    a = BCSR.rmat(10, 8.0, seed=3)
    assert a.shape == (1024, 1024)
    # ~edge_factor * n edges minus dedup losses
    assert 4000 < a.nnz <= 8192
    deg = np.diff(a.indptr)
    # power-law skew: the top-1% rows hold far more than 1% of edges
    top = np.sort(deg)[-10:].sum()
    assert top > 0.05 * a.nnz, (top, a.nnz)
    # canonical CSR invariants
    for i in range(0, 1024, 97):
        r = a.row(i)
        assert np.all(np.diff(r) > 0)


def test_rmat_symmetric():
    a = BCSR.rmat(8, 4.0, seed=1, symmetric=True)
    assert a.equals(a.transpose().sort_indices().sum_duplicates())


def test_rmat_spgemm_oracle():
    from binary_spgemm_tpu import spgemm
    from binary_spgemm_tpu.utils.oracle import spgemm_oracle

    a = BCSR.rmat(9, 6.0, seed=5)
    assert spgemm(a, a).equals(spgemm_oracle(a, a))


def test_random_blocked_structure():
    a = BCSR.random_blocked(1024, 128, 2.0, 0.3, seed=5)
    assert a.shape == (1024, 1024) and a.nnz > 0
    # entries cluster into few distinct 128x128 blocks
    rows = np.repeat(np.arange(1024), np.diff(a.indptr))
    bkeys = (rows // 128) * 8 + a.indices // 128
    assert len(np.unique(bkeys)) <= 24


def test_random_blocked_spgemm_parity():
    from binary_spgemm_tpu import BlockedBCSR, bsr_spgemm, spgemm
    from binary_spgemm_tpu.utils.oracle import spgemm_oracle

    a = BCSR.random_blocked(512, 128, 1.5, 0.2, seed=6)
    ref = spgemm_oracle(a, a)
    assert spgemm(a, a).equals(ref)
    blk = BlockedBCSR.from_bcsr(a, 128)
    assert bsr_spgemm(blk, blk).to_bcsr().equals(ref)


def test_torch_interop_roundtrip():
    torch = pytest.importorskip("torch")
    m = BCSR.random(120, 90, 2.5, seed=13)
    t = m.to_torch()
    assert t.layout == torch.sparse_csr and tuple(t.shape) == (120, 90)
    assert BCSR.from_torch(t).equals(m)
    # COO / CSC / dense ingestion all canonicalise to the same pattern
    assert BCSR.from_torch(t.to_sparse_coo()).equals(m)
    assert BCSR.from_torch(t.to_sparse_csc()).equals(m)
    dense = torch.from_numpy(m.to_dense())
    assert BCSR.from_torch(dense).equals(m)


def test_torch_explicit_zeros_dropped():
    torch = pytest.importorskip("torch")
    # torch keeps explicit zeros after masked/sub ops; every layout must
    # yield the same pattern as the dense view
    t = torch.sparse_csr_tensor(
        torch.tensor([0, 2, 3]), torch.tensor([0, 1, 1]),
        torch.tensor([1.0, 0.0, 2.0]), size=(2, 2),
    )
    want = BCSR.from_torch(t.to_dense())
    assert want.nnz == 2
    assert BCSR.from_torch(t).equals(want)
    assert BCSR.from_torch(t.to_sparse_coo()).equals(want)
    assert BCSR.from_torch(t.to_sparse_csc()).equals(want)


def test_is_canonical_and_fastpath():
    m = BCSR.random(50, 50, 3.0, seed=1)
    assert m.is_canonical()
    assert m.sum_duplicates() is m  # fast path: no copy when canonical
    dup = BCSR.from_coo(
        np.array([0, 0, 0, 2, 1]), np.array([3, 3, 1, 2, 4]), (3, 5)
    )
    assert not dup.is_canonical()
    canon = dup.sum_duplicates()
    assert canon.is_canonical() and canon.nnz == 4


def test_coo_col_range_check():
    # cols out of range must raise, like rows always have (a col >= n_cols
    # would collide with the device kernels' sentinels)
    with pytest.raises(ValueError, match="column index out of range"):
        BCSR.from_coo(np.array([0, 1]), np.array([0, 5]), (2, 5))
    with pytest.raises(ValueError, match="column index out of range"):
        BCSR.from_coo(np.array([0, 1]), np.array([0, -1]), (2, 5))
    with pytest.raises(ValueError):
        BCSR.from_coo(np.array([0, 2]), np.array([0, 1]), (2, 5))  # row OOR
    # transpose=True swaps the roles: the check must follow the swap
    with pytest.raises(ValueError, match="column index out of range"):
        BCSR.from_coo(np.array([7, 1]), np.array([0, 1]), (5, 2), transpose=True)


def test_diff_verbose_report():
    a = BCSR.from_dense(np.array([[1, 0, 1], [0, 1, 0], [1, 1, 1]]))
    assert a.diff(a) == ""
    b = BCSR.from_dense(np.array([[1, 0, 1], [0, 0, 1], [1, 1, 1]]))
    rep = a.diff(b)
    assert "row 1" in rep and "row 0" not in rep
    c = BCSR.from_dense(np.array([[1, 0], [0, 1]]))
    assert "shape mismatch" in a.diff(c)
    # same lengths, different columns
    d = BCSR.from_dense(np.array([[1, 0, 1], [0, 0, 1], [1, 1, 1]]))
    e = BCSR.from_dense(np.array([[1, 1, 0], [0, 0, 1], [1, 1, 1]]))
    rep = d.diff(e)
    assert "row 0" in rep and "row 1" not in rep


def test_banded_generator_structure():
    m = BCSR.banded(2000, 8.0, 64, seed=1)
    assert m.is_canonical()
    rows, cols = m.to_coo()
    assert (np.abs(rows.astype(np.int64) - cols) <= 64).all()
    # full unit diagonal present
    diag = rows == cols
    assert diag.sum() == 2000
    # density near target
    assert 6.0 < m.nnz / 2000 < 10.0
    # oracle parity on the product
    from binary_spgemm_tpu import spgemm
    from binary_spgemm_tpu.utils.oracle import spgemm_oracle

    assert spgemm(m, m).equals(spgemm_oracle(m, m))
