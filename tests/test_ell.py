"""Sliced-ELLPACK engine: bit-exact parity with the ESC engine and the oracle."""
import numpy as np
import pytest

from binary_spgemm_tpu import BCSR, ell_spgemm, spgemm
from binary_spgemm_tpu.ops.ell import EllB, EllSpGEMMExecutor, width_bucket
from binary_spgemm_tpu.utils.oracle import spgemm_oracle


def test_width_bucket():
    assert [width_bucket(w) for w in [1, 2, 3, 5, 8, 9, 13, 16, 17, 33]] == [
        1, 2, 3, 5, 8, 10, 14, 16, 20, 40,
    ]
    for w in range(1, 300):
        wb = width_bucket(w)
        assert w <= wb < 1.25 * w + 4  # eighth-octave worst case


def test_ellb_layout_roundtrip():
    b = BCSR.random(200, 170, 5.0, seed=3)
    ell = EllB.build(b)
    w = np.diff(b.indptr)
    for r in range(200):
        if w[r] == 0:
            assert ell.class_of_row[r] == -1
            continue
        ci = ell.class_of_row[r]
        tbl = ell.tables[ci]
        row = tbl[ell.pos_in_class[r]]
        assert np.array_equal(row[: w[r]], b.row(r))
        assert np.all(row[w[r] :] == b.n_cols)  # sentinel padding


@pytest.mark.parametrize("seed,n,d", [(0, 300, 3.0), (1, 500, 8.0), (2, 257, 1.0)])
def test_ell_matches_oracle(seed, n, d):
    a = BCSR.random(n, n, d, seed=seed)
    c = ell_spgemm(a, a)
    assert c.equals(spgemm_oracle(a, a))
    assert c.equals(spgemm(a, a))


def test_ell_rectangular():
    a = BCSR.random(123, 301, 3.0, seed=11)
    b = BCSR.random(301, 203, 2.0, seed=12)
    assert ell_spgemm(a, b).equals(spgemm_oracle(a, b))


def test_ell_rmat_powerlaw():
    a = BCSR.rmat(9, 6.0, seed=5)
    assert ell_spgemm(a, a).equals(spgemm_oracle(a, a))


def test_ell_empty_and_degenerate():
    z = BCSR(np.zeros(11, np.int32), np.zeros(0, np.int32), (10, 10))
    assert ell_spgemm(z, z).equals(spgemm_oracle(z, z))
    # B with empty rows referenced by A
    rows = np.array([0, 1, 2])
    cols = np.array([5, 5, 5])
    a = BCSR.from_coo(rows, cols, (3, 6))
    b = BCSR.from_coo(np.array([0]), np.array([1]), (6, 4))  # row 5 empty
    assert ell_spgemm(a, b).equals(spgemm_oracle(a, b))


def test_ell_executor_reuse():
    a = BCSR.random(200, 200, 4.0, seed=9)
    ex = EllSpGEMMExecutor(a, a)
    c1 = ex.assemble(ex.run())
    c2 = ex.assemble(ex.run())
    assert c1.equals(c2) and c1.equals(spgemm_oracle(a, a))


def test_ell_masked_matches_esc_and_oracle():
    from binary_spgemm_tpu import masked_spgemm
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle as masked_oracle

    a = BCSR.random(400, 400, 5.0, seed=21)
    f = BCSR.random(400, 400, 3.0, seed=22)
    ex = EllSpGEMMExecutor(a, a)
    c_ell = ex.assemble(ex.run_masked(f))
    assert c_ell.equals(masked_oracle(f, a, a))
    assert c_ell.equals(masked_spgemm(f, a, a))


def test_ell_masked_chunked():
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle as masked_oracle

    a = BCSR.random(600, 600, 4.0, seed=23)
    f = BCSR.random(600, 600, 2.0, seed=24)
    ex = EllSpGEMMExecutor(a, a, row_chunks=4)
    c = ex.assemble(ex.run_masked(f))
    assert c.equals(masked_oracle(f, a, a))


def test_ell_super_chunked_dispatch(monkeypatch):
    # force tiny per-dispatch budget -> multiple dispatch groups + dummy pad
    import binary_spgemm_tpu.ops.ell as ell_mod

    a = BCSR.random(500, 500, 6.0, seed=31)
    ex_ref = EllSpGEMMExecutor(a, a, row_chunks=5)
    monkeypatch.setattr(ell_mod, "DISPATCH_SLOT_BUDGET", ex_ref.sort_pad * 2)
    ex = EllSpGEMMExecutor(a, a, row_chunks=5)
    assert ex.n_groups >= 2, (ex.n_groups, ex.group_size)
    c = ex.assemble(ex.run())
    assert c.equals(spgemm_oracle(a, a))
    # masked through the grouped path too
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle

    f = BCSR.random(500, 500, 2.0, seed=32)
    cm = ex.assemble(ex.run_masked(f))
    assert cm.equals(masked_spgemm_oracle(f, a, a))


def test_ell_streaming_assembly(monkeypatch):
    import binary_spgemm_tpu.ops.ell as ell_mod

    a = BCSR.random(500, 500, 6.0, seed=41)
    ex_ref = EllSpGEMMExecutor(a, a, row_chunks=5)
    monkeypatch.setattr(ell_mod, "DISPATCH_SLOT_BUDGET", ex_ref.sort_pad * 2)
    ex = EllSpGEMMExecutor(a, a, row_chunks=5)
    c = ex.run_assemble_streaming()
    assert c.equals(spgemm_oracle(a, a))


def test_ell_dealt_plan_matches_oracle():
    # power-law rows: the dealt (snake-dealt row bins) plan's home turf
    a = BCSR.rmat(10, 5.0, seed=61)
    ex = EllSpGEMMExecutor(a, a, row_chunks="deal")
    assert ex.row_sets is not None and ex.chunks is None
    # the dealt row sets partition [0, n)
    allrows = np.sort(np.concatenate(ex.row_sets))
    assert np.array_equal(allrows, np.arange(a.n_rows))
    ref = spgemm_oracle(a, a)
    assert ex.assemble(ex.run()).equals(ref)
    assert ex.run_assemble_streaming().equals(ref)
    # contig plan on the same input agrees bit-exactly
    exc = EllSpGEMMExecutor(a, a, row_chunks="contig")
    assert exc.row_sets is None
    assert exc.assemble(exc.run()).equals(ref)


def test_ell_dealt_masked_and_staged():
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle as mo

    a = BCSR.rmat(9, 4.0, seed=62)
    f = BCSR.random(a.n_rows, a.n_cols, 3.0, seed=63)
    ex = EllSpGEMMExecutor(a, a, row_chunks="deal", masked=True)
    assert ex.row_sets is not None
    ref = mo(f, a, a)
    assert ex.assemble(ex.run_masked(f)).equals(ref)
    staged = ex.stage_mask(f)
    assert ex.assemble(ex.run_masked(staged)).equals(ref)


def test_ell_dealt_super_chunked(monkeypatch):
    import binary_spgemm_tpu.ops.ell as ell_mod

    a = BCSR.rmat(9, 5.0, seed=64)
    ex_ref = EllSpGEMMExecutor(a, a, row_chunks="deal")
    monkeypatch.setattr(
        ell_mod, "DISPATCH_SLOT_BUDGET", ex_ref.sort_pad * ex_ref.n_chunks // 3
    )
    ex = EllSpGEMMExecutor(a, a, row_chunks="deal")
    assert ex.n_groups >= 2
    assert ex.assemble(ex.run()).equals(spgemm_oracle(a, a))


def test_ell_pad_rowset_csr():
    from binary_spgemm_tpu.ops.ell import _pad_rowset_csr

    a = BCSR.random(40, 17, 3.0, seed=65)
    rows = np.array([7, 0, 33, 12], dtype=np.int64)
    ptr, idx, total = _pad_rowset_csr(a, rows, rows_pad=8, nnz_pad=64, fill=17)
    lens = np.diff(a.indptr)[rows]
    assert total == lens.sum()
    assert ptr[0] == 0 and np.all(ptr[len(rows):] == total)
    expect = np.concatenate([a.row(r) for r in rows])
    assert np.array_equal(idx[:total], expect)
    assert np.all(idx[total:] == 17)


def test_ell_staged_mask_reuse():
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle as mo

    a = BCSR.random(300, 300, 4.0, seed=51)
    f = BCSR.random(300, 300, 2.0, seed=52)
    ex = EllSpGEMMExecutor(a, a)
    staged = ex.stage_mask(f)
    c1 = ex.assemble(ex.run_masked(staged))
    c2 = ex.assemble(ex.run_masked(staged))  # reuse, no host prep
    c3 = ex.assemble(ex.run_masked(f))       # per-call staging path
    ref = mo(f, a, a)
    assert c1.equals(ref) and c2.equals(ref) and c3.equals(ref)


def test_compact_pull_assembly(monkeypatch):
    # force the compact-before-pull assembly (device-side prefix packing +
    # paged pull) and check bit-exactness on every executor pull path
    import binary_spgemm_tpu.ops.spgemm as sp
    from binary_spgemm_tpu.ops.spgemm import SpGEMMExecutor
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle

    monkeypatch.setattr(sp, "COMPACT_PULL_BYTES", 0)
    monkeypatch.setattr(sp, "PULL_PAGE", 1 << 10)  # force multiple pages
    a = BCSR.random(500, 500, 6.0, seed=71)
    ex = EllSpGEMMExecutor(a, a, row_chunks=5)
    assert ex.assemble(ex.run()).equals(spgemm_oracle(a, a))
    f = BCSR.random(500, 500, 2.0, seed=72)
    assert ex.assemble(ex.run_masked(f)).equals(masked_spgemm_oracle(f, a, a))
    exd = EllSpGEMMExecutor(a, a, row_chunks="deal")
    assert exd.assemble(exd.run()).equals(spgemm_oracle(a, a))
    ex2 = SpGEMMExecutor(a, a, chunk_flops=1 << 12)
    assert ex2.assemble(ex2.run()).equals(spgemm_oracle(a, a))
    # streaming assembly compacts per dispatch group
    assert ex.run_assemble_streaming().equals(spgemm_oracle(a, a))


def test_compact_chunks_and_pull_prefix_units():
    import jax.numpy as jnp

    from binary_spgemm_tpu.ops.spgemm import compact_chunks, pull_prefix

    idx = np.arange(64, dtype=np.int32).reshape(4, 16)
    nnz = np.array([3, 0, 16, 5], np.int32)
    flat = np.asarray(compact_chunks(jnp.asarray(idx), jnp.asarray(nnz)))
    expect = np.concatenate([idx[i, : nnz[i]] for i in range(4)])
    assert np.array_equal(flat[: expect.size], expect)
    # paged pull re-aligns the clamped final page
    got = pull_prefix(jnp.asarray(flat), int(expect.size), page=7)
    assert np.array_equal(got, flat[: expect.size])
    assert pull_prefix(jnp.asarray(flat), 0).size == 0


def test_compact_pull_groups(monkeypatch):
    # stacks past the flat gather's int32 domain compact in uniform chunk
    # groups; patch the cap down to force grouping on a small stack
    import jax.numpy as jnp

    import binary_spgemm_tpu.ops.spgemm as sp

    monkeypatch.setattr(sp, "COMPACT_PULL_BYTES", 0)
    monkeypatch.setattr(sp, "PULL_PAGE", 1 << 10)
    monkeypatch.setattr(sp, "_COMPACT_FLAT_MAX", 40)  # P=16 -> groups of 2
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 100, (5, 16), dtype=np.int32)
    nnz = np.array([3, 16, 0, 7, 5], np.int64)
    parts = sp.compact_pull(jnp.asarray(idx), nnz)
    assert parts is not None and len(parts) == 5
    for i in range(5):
        assert np.array_equal(parts[i], idx[i, : nnz[i]])


def test_compact_pull_groups_byte_gate(monkeypatch):
    # stacks whose single-block compaction temporaries (~5x the stack) would
    # not fit HBM compact group-wise even inside the int32 flat domain —
    # the R-MAT s18 OOM regression (results.jsonl 2026-08-20)
    import jax.numpy as jnp

    import binary_spgemm_tpu.ops.spgemm as sp

    monkeypatch.setattr(sp, "COMPACT_PULL_BYTES", 0)
    monkeypatch.setattr(sp, "PULL_PAGE", 1 << 10)
    monkeypatch.setattr(sp, "_COMPACT_BLOCK_BYTES", 100)  # 5x16x4=320 > 100
    monkeypatch.setattr(sp, "_COMPACT_GROUP_BYTES", 130)  # -> groups of 2
    rng = np.random.default_rng(6)
    idx = rng.integers(0, 100, (5, 16), dtype=np.int32)
    nnz = np.array([2, 16, 0, 9, 4], np.int64)
    parts = sp.compact_pull(jnp.asarray(idx), nnz)
    assert parts is not None and len(parts) == 5
    for i in range(5):
        assert np.array_equal(parts[i], idx[i, : nnz[i]])


def test_chunked_spgemm_prefix_paged_pull(monkeypatch):
    # the chunked ESC driver pages only each chunk's valid prefix when the
    # padded chunk is large enough
    import binary_spgemm_tpu.ops.spgemm as sp

    monkeypatch.setattr(sp, "COMPACT_PULL_BYTES", 0)
    monkeypatch.setattr(sp, "PULL_PAGE", 1 << 10)
    a = BCSR.random(600, 600, 5.0, seed=91)
    c = sp.spgemm(a, a, chunk_flops=1 << 13)  # force the chunked ESC path
    assert c.equals(spgemm_oracle(a, a))


def test_native_class_partition_matches_numpy():
    # the OpenMP counting-sort partition must be order-identical with the
    # numpy stable-argsort fallback (incl. empty B rows -> class -1 entries)
    from binary_spgemm_tpu.native import class_partition
    from binary_spgemm_tpu.ops.ell import EllB

    rng = np.random.default_rng(17)
    for trial in range(8):
        n = int(rng.integers(30, 400))
        a = BCSR.random(n, n, float(rng.uniform(0.5, 6.0)), seed=trial)
        b = BCSR.random(n, n, float(rng.uniform(0.2, 4.0)), seed=trial + 70)
        ell = EllB.build(b)
        got = class_partition(
            a.indptr, a.indices, ell.class_of_row, ell.pos_in_class,
            len(ell.widths),
        )
        if got is None:
            import pytest

            pytest.skip("native library unavailable")
        # numpy reference (the in-module fallback path)
        entry_rows = np.repeat(np.arange(n, dtype=np.int32), np.diff(a.indptr))
        cls = np.asarray(ell.class_of_row)[a.indices]
        pos = np.asarray(ell.pos_in_class)[a.indices]
        live = cls >= 0
        entry_rows, cls, pos = entry_rows[live], cls[live], pos[live]
        order = np.argsort(cls.astype(np.int16), kind="stable")
        for ci in range(len(ell.widths)):
            sel = order[cls[order] == ci]
            assert np.array_equal(got[0][ci], entry_rows[sel]), (trial, ci)
            assert np.array_equal(got[1][ci], pos[sel]), (trial, ci)


def test_native_row_weight_matches_numpy():
    from binary_spgemm_tpu.native import row_weight
    from binary_spgemm_tpu.ops.spgemm import row_flops

    rng = np.random.default_rng(19)
    for trial in range(6):
        n = int(rng.integers(30, 500))
        a = BCSR.random(n, n, float(rng.uniform(0.3, 6.0)), seed=trial)
        b = BCSR.random(n, n, float(rng.uniform(0.3, 6.0)), seed=trial + 7)
        blen = np.diff(b.indptr).astype(np.int64)
        got = row_weight(a.indptr, a.indices, blen)
        if got is None:
            import pytest

            pytest.skip("native library unavailable")
        per = blen[a.indices] if a.nnz else np.zeros(0, np.int64)
        cum = np.zeros(a.nnz + 1, np.int64)
        np.cumsum(per, out=cum[1:])
        want = cum[a.indptr[1:]] - cum[a.indptr[:-1]]
        assert np.array_equal(got, want)
        assert np.array_equal(row_flops(a, b), want)


def test_native_table_fill_matches_numpy(monkeypatch):
    # EllB.build's native one-pass scatter must produce byte-identical
    # tables (incl. sentinel tails) to the numpy fallback branch
    import binary_spgemm_tpu.native as native_mod
    from binary_spgemm_tpu.ops.ell import EllB

    rng = np.random.default_rng(23)
    for trial in range(6):
        n = int(rng.integers(30, 400))
        b = BCSR.random(n, n, float(rng.uniform(0.2, 6.0)), seed=trial + 40)
        ell_native = EllB.build(b)
        monkeypatch.setattr(native_mod, "table_fill", lambda *a, **k: None)
        ell_numpy = EllB.build(b)
        monkeypatch.undo()
        assert ell_native.widths == ell_numpy.widths
        assert np.array_equal(ell_native.class_of_row, ell_numpy.class_of_row)
        assert np.array_equal(ell_native.pos_in_class, ell_numpy.pos_in_class)
        for tn, tp in zip(ell_native.tables, ell_numpy.tables):
            assert np.array_equal(tn, tp), trial


def test_native_row_weight_bounds_check():
    from binary_spgemm_tpu.native import row_weight

    a = BCSR.random(50, 80, 2.0, seed=3)  # cols up to 79
    short_weight = np.ones(40, np.int64)  # too short
    if row_weight(a.indptr, a.indices, np.ones(80, np.int64)) is None:
        pytest.skip("native library unavailable")
    with pytest.raises(IndexError):
        row_weight(a.indptr, a.indices, short_weight)


def test_cached_executor_identity():
    import binary_spgemm_tpu.ops.ell as ell_mod
    from binary_spgemm_tpu.ops.ell import cached_executor

    ell_mod._EXEC_CACHE.clear()
    a = BCSR.random(300, 300, 3.0, seed=71)
    b = BCSR.random(300, 300, 3.0, seed=72)
    ex1 = cached_executor(a, b)
    assert cached_executor(a, b) is ex1            # identity hit
    assert cached_executor(a, b, masked=True) is not ex1  # masked keyed apart
    assert cached_executor(b, a) is not ex1        # order matters
    assert ex1.assemble(ex1.run()).equals(spgemm_oracle(a, b))
    # dead-weakref entries are dropped, not returned
    key = (id(a), id(b), False, False)
    assert key in ell_mod._EXEC_CACHE
    import weakref

    class _Dead:
        def __call__(self):
            return None

    wa, wb, ex = ell_mod._EXEC_CACHE[key]
    ell_mod._EXEC_CACHE[key] = (_Dead(), wb, ex)
    ex2 = cached_executor(a, b)
    assert ex2 is not ex1
    ell_mod._EXEC_CACHE.clear()


def test_cached_executor_eviction():
    import binary_spgemm_tpu.ops.ell as ell_mod
    from binary_spgemm_tpu.ops.ell import cached_executor

    ell_mod._EXEC_CACHE.clear()
    mats = [BCSR.random(100, 100, 2.0, seed=80 + i) for i in range(6)]
    for m in mats:
        cached_executor(m, m)
    assert len(ell_mod._EXEC_CACHE) <= ell_mod._EXEC_CACHE_MAX
    ell_mod._EXEC_CACHE.clear()


def test_stage_mask_identity_cache():
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle as mo

    a = BCSR.random(300, 300, 4.0, seed=73)
    f = BCSR.random(300, 300, 2.0, seed=74)
    ex = EllSpGEMMExecutor(a, a)
    s1 = ex.stage_mask(f)
    assert ex.stage_mask(f) is s1  # identity-cached staging
    f2 = BCSR.random(300, 300, 2.0, seed=75)
    s2 = ex.stage_mask(f2)
    assert s2 is not s1
    assert ex.assemble(ex.run_masked(s1)).equals(mo(f, a, a))
    assert ex.assemble(ex.run_masked(s2)).equals(mo(f2, a, a))
