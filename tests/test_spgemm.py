import numpy as np
import pytest

from binary_spgemm_tpu import BCSR, spgemm, spgemm_flops
from binary_spgemm_tpu.utils.oracle import spgemm_oracle, spgemm_dense_oracle
from tests.conftest import random_pair


def check(a, b, **kw):
    c = spgemm(a, b, **kw)
    expected = spgemm_oracle(a, b)
    assert c.equals(expected), (
        f"mismatch: got nnz={c.nnz}, want nnz={expected.nnz}"
    )
    return c


def test_tiny_handchecked():
    a = BCSR.from_dense(np.array([[1, 1, 0], [0, 0, 1], [0, 0, 0]]))
    b = BCSR.from_dense(np.array([[1, 0, 0], [1, 0, 1], [0, 1, 1]]))
    c = spgemm(a, b)
    np.testing.assert_array_equal(
        c.to_dense(), spgemm_dense_oracle(a, b)
    )
    # ascending column order per row — the reference sorts every row
    # (final/SpGEMM_mpi_omp.c:47)
    for i in range(c.n_rows):
        row = c.row(i)
        assert np.all(np.diff(row) > 0)


@pytest.mark.parametrize("seed", range(5))
def test_random_square_self_multiply(seed):
    # C = A·A — the reference's benchmark computation (final/SpGEMM_mpi_omp.c:322)
    a = BCSR.random(300, 300, 4.0, seed=seed)
    check(a, a)


@pytest.mark.parametrize("n,m,k,d", [(128, 64, 200, 3.0), (50, 400, 30, 5.0)])
def test_rectangular(n, m, k, d):
    a, b = random_pair(n, m, k, d)
    check(a, b)


def test_empty_rows_and_cols():
    a = BCSR.from_dense(np.zeros((10, 10)))
    b = BCSR.random(10, 10, 2.0, seed=0)
    assert spgemm(a, b).nnz == 0
    assert spgemm(b, a).nnz == 0


def test_dense_small():
    a = BCSR.from_dense(np.ones((20, 20)))
    c = check(a, a)
    assert c.nnz == 400


def test_duplicate_input_entries():
    # ingest keeps duplicates (no dedup in coo2csc); the kernel must still
    # produce canonical output
    rows = np.array([0, 0, 1, 1])
    cols = np.array([1, 1, 0, 0])
    a = BCSR.from_coo(rows, cols, (2, 2))
    assert a.nnz == 4
    c = spgemm(a, a)
    np.testing.assert_array_equal(c.to_dense(), np.eye(2, dtype=bool))


def test_chunked_matches_unchunked():
    a = BCSR.random(500, 500, 6.0, seed=42)
    c_one = spgemm(a, a)
    c_chunked = spgemm(a, a, chunk_flops=1000)  # forces many chunks
    assert c_one.equals(c_chunked)
    assert c_one.equals(spgemm_oracle(a, a))


def test_skewed_rows():
    # power-law-ish: one very heavy row — exercises flop-balanced chunking
    rng = np.random.default_rng(0)
    rows = np.concatenate([np.zeros(500, int), rng.integers(0, 200, 300)])
    cols = rng.integers(0, 200, 800)
    a = BCSR.from_coo(rows, cols, (200, 200)).sum_duplicates()
    check(a, a, chunk_flops=2048)


def test_spgemm_flops():
    a = BCSR.from_dense(np.array([[1, 1], [0, 1]]))
    b = BCSR.from_dense(np.array([[1, 0], [1, 1]]))
    assert spgemm_flops(a, b) == 5


def test_validity_fixture_parity():
    # ≡ make test (final/Makefile:11-12): hyper-sparse 50000×50000 with ~0.5
    # nnz/row, serial-vs-parallel bit-exact — here scaled-down oracle check plus
    # the committed fixture in tests/fixtures (generated, not copied).
    a = BCSR.random(5000, 5000, 0.5, seed=2021)
    check(a, a)


def test_sort_compress_seps_matches_sort_compress():
    # the separator-embedded compress must reproduce sort_compress exactly
    # after the host split, duplicates and sentinel padding included
    import jax.numpy as jnp

    from binary_spgemm_tpu.ops.spgemm import (
        sort_compress,
        sort_compress_seps,
        split_seps,
    )

    rng = np.random.default_rng(11)
    n_rows, n_cols = 37, 53
    row = rng.integers(0, n_rows, 400).astype(np.int32)
    col = rng.integers(0, n_cols, 400).astype(np.int32)
    # sentinel padding tail
    row[350:] = n_rows
    col[350:] = n_cols
    ptr_ref, idx_ref, nnz_ref = sort_compress(
        jnp.asarray(row), jnp.asarray(col), n_rows, n_cols
    )
    srow = np.concatenate([row, np.arange(n_rows, dtype=np.int32)])
    scol = np.concatenate([col, np.full(n_rows, n_cols, np.int32)])
    idx, nnz = sort_compress_seps(
        jnp.asarray(srow), jnp.asarray(scol), n_rows, n_cols
    )
    ptr, indices, real = split_seps(
        np.asarray(idx), int(nnz), n_rows, n_cols
    )
    assert real == int(nnz_ref)
    assert np.array_equal(ptr, np.asarray(ptr_ref))
    assert np.array_equal(indices, np.asarray(idx_ref)[:real])


def test_spgemm_unpackable_key_domain():
    # n_cols large enough that (row, col) cannot pack into one int32: the
    # engines must take the 2-key sort paths (with separators) and stay
    # bit-exact
    from binary_spgemm_tpu.ops.spgemm import packable

    rng = np.random.default_rng(12)
    m = 1 << 26  # output column domain: (rows << 27) overflows int32
    rows = rng.integers(0, 100, 500)
    cols = rng.integers(0, 500, 500)
    a = BCSR.from_coo(rows, cols, (100, 500))
    b_rows = rng.integers(0, 500, 1500)
    b_cols = rng.integers(0, m, 1500)
    b = BCSR.from_coo(b_rows, b_cols, (500, m))
    assert not packable(100, m)
    c = spgemm(a, b)
    assert c.equals(spgemm_oracle(a, b))
    from binary_spgemm_tpu.ops.ell import ell_spgemm

    c2 = ell_spgemm(a, b)
    assert c2.equals(spgemm_oracle(a, b))


def test_chunk_rows_matches_greedy_loop():
    # the searchsorted-per-chunk planner must match the original greedy
    # row loop exactly (chunk plans feed compiled-shape caches)
    from binary_spgemm_tpu.ops.spgemm import _chunk_rows

    def loop_ref(rf, budget, max_rows=None):
        chunks = []
        start, acc = 0, 0
        for i, f in enumerate(rf):
            if (acc and acc + f > budget) or (
                max_rows is not None and i - start >= max_rows
            ):
                chunks.append((start, i))
                start, acc = i, 0
            acc += int(f)
        chunks.append((start, len(rf)))
        return chunks

    rng = np.random.default_rng(0)
    for trial in range(60):
        n = int(rng.integers(1, 200))
        rf = rng.integers(0, 50, n).astype(np.int64)
        if trial % 3 == 0:
            rf[int(rng.integers(0, n))] = 1000  # oversized single row
        if trial % 4 == 0:
            rf[-max(1, n // 4):] = 0  # trailing zero-flop rows
        budget = int(rng.integers(1, 200))
        mr = None if trial % 2 else int(rng.integers(1, 20))
        assert _chunk_rows(rf, budget, mr) == loop_ref(rf, budget, mr), trial
    assert _chunk_rows(np.zeros(0, np.int64), 10) == [(0, 0)]


def test_split_seps_bad_separator_count_raises():
    import numpy as np
    import pytest

    from binary_spgemm_tpu.ops.spgemm import split_seps

    # stream claims 3 rows but carries only 2 separators (sentinel = n_cols)
    stream = np.array([0, 1, 5, 2, 5, 0], dtype=np.int32)
    with pytest.raises(RuntimeError, match="separator-count invariant"):
        split_seps(stream, nnz=6, n_rows=3, n_cols=5)


def test_giant_row_windowed_expansion(monkeypatch):
    """A row whose flop count exceeds the per-chunk int32 domain is computed
    by the column-windowed fallback (threshold lowered so the test is
    fast; ≡ the realloc-growth coverage of final/SpGEMM_mpi_omp.c:28-31)."""
    import numpy as np

    from binary_spgemm_tpu import BCSR, spgemm
    from binary_spgemm_tpu.ops import spgemm as sp
    from binary_spgemm_tpu.utils.oracle import spgemm_oracle

    monkeypatch.setattr(sp, "GIANT_ROW_FLOPS", 300)
    rng = np.random.default_rng(0)
    a = BCSR.random(200, 200, 2.0, seed=1)
    # make rows 3 and 107 giant: reference many B rows
    rows, cols = a.to_coo()
    extra_r = np.concatenate([np.full(150, 3), np.full(180, 107)])
    extra_c = rng.integers(0, 200, size=330)
    a2 = BCSR.from_coo(
        np.concatenate([rows, extra_r]), np.concatenate([cols, extra_c]),
        (200, 200),
    ).sum_duplicates()
    from binary_spgemm_tpu.ops.spgemm import row_flops

    assert row_flops(a2, a2).max() > 300
    assert spgemm(a2, a2).equals(spgemm_oracle(a2, a2))
    # single B row longer than the budget (the one-entry window case)
    b_rows = np.concatenate([np.zeros(400, np.int64), np.arange(200)])
    b_cols = np.concatenate([rng.integers(0, 200, 400), np.arange(200)])
    b = BCSR.from_coo(b_rows, b_cols, (200, 200)).sum_duplicates()
    monkeypatch.setattr(sp, "GIANT_ROW_FLOPS", 100)
    assert spgemm(a2, b).equals(spgemm_oracle(a2, b))
    # giant row at the matrix edges
    a3 = BCSR.from_coo(
        np.concatenate([np.zeros(160, np.int64), np.full(160, 199)]),
        np.concatenate([rng.integers(0, 200, 160), rng.integers(0, 200, 160)]),
        (200, 200),
    ).sum_duplicates()
    assert spgemm(a3, b).equals(spgemm_oracle(a3, b))
