import numpy as np
import pytest

from binary_spgemm_tpu import BCSR, masked_spgemm, spgemm
from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle


def check(f, a, b, **kw):
    c = masked_spgemm(f, a, b, **kw)
    expected = masked_spgemm_oracle(f, a, b)
    assert c.equals(expected), f"got nnz={c.nnz}, want nnz={expected.nnz}"
    return c


def test_tiny_handchecked():
    a = BCSR.from_dense(np.array([[1, 1, 0], [0, 0, 1], [1, 0, 1]]))
    f = BCSR.from_dense(np.array([[1, 0, 0], [0, 1, 1], [0, 0, 0]]))
    c = check(f, a, a)
    # mask semantics: C ⊆ F and C ⊆ A·B
    full = spgemm(a, a)
    assert np.all(c.to_dense() <= f.to_dense())
    assert np.all(c.to_dense() <= full.to_dense())


@pytest.mark.parametrize("seed", range(4))
def test_random(seed):
    a = BCSR.random(200, 200, 4.0, seed=seed)
    f = BCSR.random(200, 200, 8.0, seed=seed + 100)
    check(f, a, a)


def test_full_mask_equals_unmasked():
    a = BCSR.random(120, 120, 3.0, seed=5)
    f = BCSR.from_dense(np.ones((120, 120)))
    c = check(f, a, a)
    assert c.equals(spgemm(a, a))


def test_empty_mask():
    a = BCSR.random(50, 50, 3.0, seed=1)
    f = BCSR.from_dense(np.zeros((50, 50)))
    assert masked_spgemm(f, a, a).nnz == 0


def test_diagonal_mask():
    # classic use: which rows intersect themselves — F = I
    a = BCSR.random(150, 150, 5.0, seed=9)
    f = BCSR.from_dense(np.eye(150))
    check(f, a, a)


def test_chunked():
    a = BCSR.random(300, 300, 5.0, seed=3)
    f = BCSR.random(300, 300, 10.0, seed=4)
    c1 = check(f, a, a)
    c2 = masked_spgemm(f, a, a, chunk_flops=1024)
    assert c1.equals(c2)
