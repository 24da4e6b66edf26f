import numpy as np
import pytest

from binary_spgemm_tpu import BCSR, spm_or
from binary_spgemm_tpu.utils.oracle import union_oracle


@pytest.mark.parametrize("seed", range(4))
def test_random_union(seed):
    a = BCSR.random(200, 150, 3.0, seed=seed)
    b = BCSR.random(200, 150, 3.0, seed=seed + 50)
    c = spm_or(a, b)
    assert c.equals(union_oracle(a, b))


def test_union_tiny():
    a = BCSR.from_dense(np.array([[1, 0, 1], [0, 0, 0]]))
    b = BCSR.from_dense(np.array([[0, 1, 1], [1, 0, 0]]))
    c = spm_or(a, b)
    np.testing.assert_array_equal(c.to_dense(), a.to_dense() | b.to_dense())
    # union output is canonical even when inputs carry duplicates
    dup = BCSR.from_coo(np.array([0, 0]), np.array([2, 2]), (2, 3))
    c2 = spm_or(dup, b)
    np.testing.assert_array_equal(c2.to_dense(), dup.to_dense() | b.to_dense())


def test_union_idempotent():
    a = BCSR.random(80, 80, 4.0, seed=7)
    assert spm_or(a, a).equals(a.sum_duplicates())


def test_union_empty():
    a = BCSR.random(30, 30, 2.0, seed=0)
    empty = BCSR.from_dense(np.zeros((30, 30)))
    assert spm_or(a, empty).equals(a.sum_duplicates())
