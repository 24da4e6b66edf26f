import numpy as np
import pytest

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.utils.debug import format_csr


def test_format_csr():
    mat = BCSR.from_dense(np.array([[1, 0], [0, 1]]))
    s = format_csr(mat)
    lines = s.strip().splitlines()
    assert lines[0].startswith("1 .")
    assert lines[1].startswith(". 1")


def test_format_csr_blocked_rulers():
    mat = BCSR.from_dense(np.eye(4))
    s = format_csr(mat, block=2)
    assert "|" in s and "-" in s


def test_format_csr_too_large():
    mat = BCSR.random(2000, 2000, 1.0, seed=0)
    with pytest.raises(ValueError):
        format_csr(mat)
