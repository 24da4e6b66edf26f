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


def test_format_csr_ruler_width_matches_rows():
    # the horizontal rule must span exactly the printed row width
    for n, block in [(4, 2), (5, 2), (6, 3), (9, 4)]:
        mat = BCSR.from_dense(np.eye(n))
        lines = format_csr(mat, block=block).splitlines()
        rulers = [ln for ln in lines if set(ln) == {"-"}]
        rows = [ln for ln in lines if "-" not in ln]
        assert rulers, (n, block)
        assert all(len(r) == len(rows[0]) for r in rulers), (n, block)


def test_format_csr_too_large():
    mat = BCSR.random(2000, 2000, 1.0, seed=0)
    with pytest.raises(ValueError):
        format_csr(mat)
