import numpy as np
import pytest

from binary_spgemm_tpu import BCSR, read_pattern, write_pattern
from binary_spgemm_tpu import native


def test_native_lib_builds():
    # the toolchain is present in CI/dev images; if truly absent the io layer
    # falls back to numpy (covered by test_mmio), so only warn-skip here
    if native.lib() is None:
        pytest.skip("no C toolchain available")


def test_parse_pairs_matches_fallback(tmp_path):
    if native.lib() is None:
        pytest.skip("no C toolchain")
    rows, cols = native.parse_pairs(b"1 2\n3 4\n10 20\n", 3, 2)
    assert rows.tolist() == [1, 3, 10]
    assert cols.tolist() == [2, 4, 20]
    # value column skipped (real field)
    rows, cols = native.parse_pairs(b"1 2 3.5e-2\n4 5 -1\n", 2, 3)
    assert rows.tolist() == [1, 4] and cols.tolist() == [2, 5]


def test_parse_pairs_malformed():
    if native.lib() is None:
        pytest.skip("no C toolchain")
    with pytest.raises(ValueError):
        native.parse_pairs(b"1 x\n", 1, 2)
    with pytest.raises(ValueError):
        native.parse_pairs(b"1 2\n", 5, 2)  # truncated


def test_format_pairs():
    if native.lib() is None:
        pytest.skip("no C toolchain")
    out = native.format_pairs(np.array([0, 2]), np.array([1, 9]))
    assert out == b"1 2\n3 10\n"


def test_roundtrip_native_vs_fallback(tmp_path):
    m = BCSR.random(500, 500, 3.0, seed=0)
    p1 = tmp_path / "n.mtx"
    write_pattern(p1, m)
    a = read_pattern(p1, transpose=False)
    # force the numpy fallback and compare byte-identical semantics
    old_lib, old_tried = native._lib, native._tried
    try:
        native._lib, native._tried = None, True
        b = read_pattern(p1, transpose=False)
    finally:
        native._lib, native._tried = old_lib, old_tried
    assert a.equals(b) and a.equals(m)


def test_native_coo2csr_matches_numpy():
    from binary_spgemm_tpu import native
    from binary_spgemm_tpu.formats.bcsr import coo_to_csr_stable

    rng = np.random.default_rng(2)
    rows = rng.integers(0, 50, 500)
    cols = rng.integers(0, 60, 500)
    res = native.coo2csr(rows, cols, 50)
    if res is None:
        pytest.skip("no native toolchain")
    indptr, indices = res
    # numpy fallback reference (force it by computing inline)
    counts = np.bincount(rows, minlength=50)
    ref_ptr = np.zeros(51, np.int64)
    np.cumsum(counts, out=ref_ptr[1:])
    ref_idx = cols[np.argsort(rows, kind="stable")]
    assert np.array_equal(indptr, ref_ptr)
    assert np.array_equal(indices, ref_idx)
    # stability: duplicates of a row keep input order
    r2 = np.zeros(10, np.int64)
    c2 = np.arange(10)[::-1].copy()
    p2, i2 = native.coo2csr(r2, c2, 3)
    assert np.array_equal(i2, c2)
    assert p2.tolist() == [10, 10, 10, 10][:4] or p2.tolist() == [0, 10, 10, 10]


def test_native_coo2csr_out_of_range():
    from binary_spgemm_tpu import native

    if native.lib() is None:
        pytest.skip("no native toolchain")
    with pytest.raises(ValueError):
        native.coo2csr(np.array([5]), np.array([0]), 3)


def test_parallel_parse_and_convert_bit_identical():
    # Large inputs take the OpenMP parse + blocked-parallel COO->CSR tiers;
    # both must be bit-identical with the serial paths (stability included).
    import ctypes

    from binary_spgemm_tpu import native

    l = native.lib()
    if l is None:
        pytest.skip("no native toolchain")
    if not hasattr(l, "mm_parse_pairs_par"):
        pytest.skip("built without OpenMP")
    rng = np.random.default_rng(3)
    n = 1 << 21  # above both parallel thresholds
    rows = rng.integers(0, 4000, n, dtype=np.uint32)
    cols = rng.integers(0, 4000, n, dtype=np.uint32)
    body = native.format_pairs(rows, cols)
    pr, pc = native.parse_pairs(body, n, 2)
    assert np.array_equal(pr - 1, rows) and np.array_equal(pc - 1, cols)
    # parallel coo2csr vs serial-only reference
    ip, ix = native.coo2csr(rows.astype(np.int64), cols, 4000)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    ip_s = np.empty(4001, np.uint32)
    ix_s = np.empty(n, np.uint32)
    ru = np.ascontiguousarray(rows, np.uint32)
    cu = np.ascontiguousarray(cols, np.uint32)
    rc = l.coo2csr_stable(
        ru.ctypes.data_as(u32p), cu.ctypes.data_as(u32p), n, 4000,
        ip_s.ctypes.data_as(u32p), ix_s.ctypes.data_as(u32p),
    )
    assert rc == 0
    assert np.array_equal(ip, ip_s) and np.array_equal(ix, ix_s)


def test_parallel_parse_value_columns_and_ragged_lines():
    # token counting must place chunk offsets correctly with value fields
    from binary_spgemm_tpu import native

    l = native.lib()
    if l is None or not hasattr(l, "mm_parse_pairs_par"):
        pytest.skip("no OpenMP native build")
    n = 200_000
    rng = np.random.default_rng(4)
    rows = rng.integers(1, 1000, n)
    cols = rng.integers(1, 1000, n)
    vals = rng.random(n)
    body = "".join(
        f"{r} {c} {v:.6e}\n" for r, c, v in zip(rows, cols, vals)
    ).encode()
    assert len(body) > (1 << 20)
    pr, pc = native.parse_pairs(body, n, 3)
    assert np.array_equal(pr, rows) and np.array_equal(pc, cols)


def test_read_pattern_mmap_path(tmp_path):
    # files >= 16 MB take the mmap + parallel-parse ingest; must match the
    # in-memory path exactly
    from binary_spgemm_tpu import read_pattern, write_pattern
    from binary_spgemm_tpu.formats.bcsr import BCSR as _B

    m = _B.random(60_000, 60_000, 30.0, seed=5)
    p = tmp_path / "big.mtx"
    write_pattern(p, m)
    assert p.stat().st_size >= (16 << 20)
    a = read_pattern(p, transpose=False)
    assert a.equals(m)
