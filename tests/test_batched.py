"""Batched 2-D ELL engine: one [k, L] array, sorts along axis -1.

Covers the planner (model-chosen k, dominant-class snake deal, DP width-class
merge), the 2-D kernel, the vectorised batch assembly, and the auto route
(``prefer_batched``/``auto_executor``).
"""
import numpy as np
import pytest

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops.ell import (
    EllB,
    EllSpGEMMExecutor,
    auto_executor,
    prefer_batched,
)
from binary_spgemm_tpu.utils.oracle import spgemm_oracle


@pytest.mark.parametrize(
    "n,d,seed",
    [
        (3000, 4.0, 1),
        (8000, 2.0, 2),   # rows >> flops (hypersparse class)
        (2000, 8.0, 3),
        (1000, 1.0, 4),
        (1, 16.0, 5),
    ],
)
def test_batched_oracle(n, d, seed):
    a = BCSR.random(n, n, d, seed=seed)
    ex = EllSpGEMMExecutor(a, a, batched=True)
    assert ex.assemble(ex.run()).equals(spgemm_oracle(a, a))


def test_batched_rectangular_and_skew():
    a = BCSR.random(4000, 1500, 3.0, seed=6)
    b = BCSR.random(1500, 2500, 2.0, seed=7)
    ex = EllSpGEMMExecutor(a, b, batched=True)
    assert ex.assemble(ex.run()).equals(spgemm_oracle(a, b))


@pytest.mark.parametrize("n,d,seed", [(3000, 4.0, 5), (8000, 2.0, 6)])
def test_run_padded_one_sort_matches_oracle(n, d, seed):
    # one-sort mode: device skips the compaction sort, host compacts the
    # sorted-with-holes stream — must be bit-exact with both the oracle
    # and the two-sort path (measured device win: ab="one-sort")
    a = BCSR.random(n, n, d, seed=seed)
    ex = EllSpGEMMExecutor(a, a, batched=True)
    c = ex.assemble_padded(ex.run_padded())
    assert c.equals(spgemm_oracle(a, a))
    assert c.equals(ex.assemble(ex.run()))


def test_run_padded_requires_batched():
    a = BCSR.random(500, 500, 2.0, seed=8)
    ex = EllSpGEMMExecutor(a, a)  # unrolled
    with pytest.raises(ValueError, match="batched"):
        ex.run_padded()
    r = BCSR.rmat(12, 8.0, seed=8)  # power-law skew
    ex = EllSpGEMMExecutor(r, r, batched=True)
    assert ex.assemble(ex.run()).equals(spgemm_oracle(r, r))


def test_batched_explicit_k_and_batch_assembly():
    # force >= 256 chunks so the vectorised batch assembly path runs
    a = BCSR.random(20000, 20000, 3.0, seed=3)
    ex = EllSpGEMMExecutor(a, a, deal_k=512, batched=True)
    assert ex.n_chunks == 512
    assert ex.assemble(ex.run()).equals(spgemm_oracle(a, a))
    # streaming assembly agrees
    assert ex.run_assemble_streaming().equals(spgemm_oracle(a, a))


def _family_oracle_check(ex, a, b, f, d):
    """Drive every executor op against the scipy oracle (bit-exact)."""
    spa, spb = a.to_scipy(), b.to_scipy()
    spf, spd = f.to_scipy(), d.to_scipy()
    ref = spa @ spb
    ref.sort_indices()
    c = ex.assemble(ex.run())
    assert np.array_equal(c.indptr, ref.indptr)
    assert np.array_equal(c.indices, ref.indices)
    cm = ex.assemble(ex.run_masked(f))
    rm = ref.multiply(spf > 0).tocsr()
    rm.sort_indices()
    assert np.array_equal(cm.indptr, rm.indptr)
    assert np.array_equal(cm.indices, rm.indices)
    ri = (spa.astype(np.int64) @ spb.astype(np.int64)).tocsr()
    ri.sort_indices()
    cc, cnt = ex.assemble_counts(ex.run_counts())
    assert np.array_equal(cc.indices, ri.indices)
    assert np.array_equal(cnt, ri.data)
    cmc, mcnt = ex.assemble_counts(ex.run_masked_counts(f))
    rmc = ri.multiply(spf > 0).tocsr()
    rmc.sort_indices()
    assert np.array_equal(cmc.indptr, rmc.indptr)
    assert np.array_equal(mcnt, rmc.data)
    co = ex.assemble(ex.run_or(d))
    ro = ((spd + ref) > 0).tocsr()
    ro.sort_indices()
    assert np.array_equal(co.indptr, ro.indptr)
    assert np.array_equal(co.indices, ro.indices)
    com = ex.assemble(ex.run_or(d, mask=f))
    rom = ((spd + ref.multiply(spf > 0)) > 0).tocsr()
    rom.sort_indices()
    assert np.array_equal(com.indptr, rom.indptr)
    assert np.array_equal(com.indices, rom.indices)
    s = int(np.asarray(ex.run_counts_sum(f))[: ex.n_chunks].sum())
    assert s == int(ri.multiply(spf > 0).sum())


@pytest.mark.parametrize("masked", [False, True])
def test_batched_op_family_packed(masked):
    """run_masked/run_counts/run_masked_counts/run_or/run_counts_sum all
    serve the batched 2-D plan (round-2 verdict ask #4) — packed-key path."""
    n = 3000
    a = BCSR.random(n, n, 3.0, seed=1)
    b = BCSR.random(n, n, 2.0, seed=2)
    f = BCSR.random(n, n, 4.0, seed=3)
    d = BCSR.random(n, n, 1.5, seed=4)
    ex = EllSpGEMMExecutor(a, b, batched=True, deal_k=64, masked=masked)
    assert ex.batched
    _family_oracle_check(ex, a, b, f, d)


def test_batched_op_family_unpacked():
    """Wide columns + few bins break packability: the 2-key/3-key general
    branches of every batched compress function."""
    from binary_spgemm_tpu.ops.spgemm import packable

    n, m = 8000, 262145
    a = BCSR.random(n, m, 3.0, seed=1)
    b = BCSR.random(m, m, 0.2, seed=2)
    f = BCSR.random(n, m, 2.0, seed=3)
    d = BCSR.random(n, m, 1.0, seed=4)
    ex = EllSpGEMMExecutor(a, b, batched=True, deal_k=4)
    assert not packable(ex.rows_pad, 2 * m + 1)
    _family_oracle_check(ex, a, b, f, d)


def test_batched_stage_mask_reuse():
    a = BCSR.random(2000, 2000, 3.0, seed=21)
    f = BCSR.random(2000, 2000, 2.0, seed=22)
    ex = EllSpGEMMExecutor(a, a, batched=True, deal_k=32)
    staged = ex.stage_mask(f)
    assert ex.stage_mask(f) is staged  # identity cache
    out1 = ex.assemble(ex.run_masked(staged))
    out2 = ex.assemble(ex.run_masked(f))
    assert out1.equals(out2)


def test_batched_matches_unrolled_bit_exact():
    a = BCSR.random(5000, 5000, 4.0, seed=9)
    unrolled = EllSpGEMMExecutor(a, a, batched=False)
    batched = EllSpGEMMExecutor(a, a, batched=True)
    assert batched.assemble(batched.run()).equals(
        unrolled.assemble(unrolled.run())
    )


def test_prefer_batched_rule():
    # small n_cols: packed unrolled plans exist -> no batching
    small = BCSR.random(100, 100, 1.0, seed=0)
    assert not prefer_batched(small, small)
    # the rule is shape-only: a (rows > 160 * cap) shape must flip it
    wide = BCSR(
        np.zeros(3_000_001, np.int32), np.zeros(0, np.int32),
        (3_000_000, 3_000_000),
    )
    assert prefer_batched(wide, wide)


def test_auto_executor_picks_batched_for_many_rows(monkeypatch):
    # monkeypatch the threshold instead of building a 3M-row matrix
    from binary_spgemm_tpu.ops import ell as ell_mod

    a = BCSR.random(9000, 9000, 2.0, seed=11)
    monkeypatch.setattr(ell_mod, "prefer_batched", lambda a, b: True)
    ex = auto_executor(a, a)
    assert isinstance(ex, EllSpGEMMExecutor) and ex.batched
    assert ex.assemble(ex.run()).equals(spgemm_oracle(a, a))


def test_batched_skew_guard_falls_back_unrolled(monkeypatch):
    # a skewed input whose batched [k, sort_pad] stream exceeds the resident
    # cap must route to the UNROLLED dealt plan (the production skew route),
    # not ESC — R-MAT s18/s20-class blowups (BATCHED_MAX_SLOTS rationale)
    from binary_spgemm_tpu.ops import ell as ell_mod
    from binary_spgemm_tpu.ops.ell import cached_executor

    a = BCSR.random(9000, 9000, 2.0, seed=11)
    monkeypatch.setattr(ell_mod, "prefer_batched", lambda a, b: True)
    monkeypatch.setattr(ell_mod, "BATCHED_MAX_SLOTS", 1)  # force the guard
    ex = auto_executor(a, a)
    assert isinstance(ex, EllSpGEMMExecutor) and not ex.batched
    assert ex.assemble(ex.run()).equals(spgemm_oracle(a, a))
    exm = cached_executor(a, a)
    assert isinstance(exm, EllSpGEMMExecutor) and not exm.batched


def test_tuned_executor_measures_candidates():
    # empirical k refinement: measures the top model-ranked bin counts and
    # keeps the fastest, bit-exact; winner carries the (seconds, k) report
    from binary_spgemm_tpu.ops.ell import tuned_executor

    a = BCSR.random(6000, 6000, 2.0, seed=21)
    ex = tuned_executor(a, a, top=2, times=1)
    assert isinstance(ex, EllSpGEMMExecutor)
    assert len(ex.tune_report) >= 2  # batched candidate(s) + unrolled (k=0)
    assert ex.tune_report == sorted(ex.tune_report)
    win_k = ex.tune_report[0][1]
    assert win_k == (0 if not ex.batched else ex.n_chunks)
    assert any(k == 0 for _, k in ex.tune_report)  # unrolled was measured
    assert ex.assemble(ex.run()).equals(spgemm_oracle(a, a))
    # the model ranking is exposed on every batched executor
    ex2 = EllSpGEMMExecutor(a, a, batched=True)
    assert len(ex2.k_ranking) >= 1 and ex2.k_ranking == sorted(ex2.k_ranking)


def test_tuned_executor_degenerate_falls_back_unrolled():
    from binary_spgemm_tpu.ops.ell import tuned_executor

    empty = BCSR(np.zeros(101, np.int32), np.zeros(0, np.int32), (100, 100))
    ex = tuned_executor(empty, empty)
    assert isinstance(ex, EllSpGEMMExecutor) and not ex.batched
    assert ex.assemble(ex.run()).nnz == 0


def test_ellb_group_widths():
    b = BCSR.random(300, 300, 4.0, seed=12)
    fine = EllB.build(b)
    coarse = EllB.build(b, (4, 16, 64))
    assert set(coarse.widths) <= {4, 16, 64}
    # same rows represented: every nonempty row belongs to a class
    assert (coarse.class_of_row >= 0).sum() == (fine.class_of_row >= 0).sum()
    with pytest.raises(ValueError, match="do not cover"):
        EllB.build(b, (2,))


def test_inline_narrow_classes_bit_exact():
    """Width<=2 B rows inline into the staged entry stream (no class table,
    no gather); flags must reflect the byte-neutrality rule and results stay
    bit-exact on width mixes that exercise inlined + gathered classes."""
    rng = np.random.default_rng(33)
    # B with many width-1/2 rows each referenced ~once, plus wide rows
    n = 3000
    rows, cols = [], []
    for r in range(n):
        w = int(rng.choice([1, 1, 2, 2, 3, 8]))
        cs = rng.choice(n, size=w, replace=False)
        rows.extend([r] * w)
        cols.extend(cs.tolist())
    b = BCSR.from_coo(np.array(rows), np.array(cols), (n, n))
    a = BCSR.random(n, n, 2.0, seed=34)
    for batched in (False, True):
        ex = EllSpGEMMExecutor(a, b, batched=batched)
        assert any(
            inl and w <= 2 for inl, w in zip(ex.inline, ex.widths)
        ), (ex.inline, ex.widths)
        assert not any(
            inl and w > 2 for inl, w in zip(ex.inline, ex.widths)
        )
        assert ex.assemble(ex.run()).equals(spgemm_oracle(a, b))


def test_big_table_classes_inline():
    # tables past INLINE_TABLE_ROWS inline their values (the XLA big-table
    # gather pathology): verified by forcing the threshold down
    from binary_spgemm_tpu.ops import ell as ell_mod

    a = BCSR.random(4000, 4000, 3.0, seed=41)
    ex = EllSpGEMMExecutor(a, a)
    try:
        orig = ell_mod.INLINE_TABLE_ROWS
        ell_mod.INLINE_TABLE_ROWS = 8  # every real table trips the rule
        ex2 = EllSpGEMMExecutor(a, a)
    finally:
        ell_mod.INLINE_TABLE_ROWS = orig
    widths = ex2.widths
    assert any(
        inl and w > 2 and w <= ell_mod.INLINE_TABLE_W_MAX
        for inl, w in zip(ex2.inline, widths)
    )
    # wide classes (> W_MAX) still gather
    assert all(
        not inl or w <= ell_mod.INLINE_TABLE_W_MAX or w <= 2
        for inl, w in zip(ex2.inline, widths)
    )
    assert ex2.assemble(ex2.run()).equals(spgemm_oracle(a, a))
    assert ex.assemble(ex.run()).equals(spgemm_oracle(a, a))


def test_keys_compressors_match_pair_forms(monkeypatch):
    """The `_keys` compressor variants (direct packed-key stream assembly,
    ab="key-stream") must produce the same results as the GENERAL 2-key/
    3-key pair branches on the same logical streams — two independent
    implementations of the same contract (`packable` is forced False for
    the pair calls so they cannot delegate to the keys forms)."""
    import jax.numpy as jnp
    from binary_spgemm_tpu.ops import spgemm as spgemm_mod
    from binary_spgemm_tpu.ops import counts as counts_mod
    from binary_spgemm_tpu.ops import fused as fused_mod
    from binary_spgemm_tpu.ops.spgemm import (
        INT, sort_compress_seps_2d, sort_compress_seps_2d_keys,
        sort_compress_masked_seps_2d, sort_compress_masked_seps_2d_keys,
        sort_compress_2d, sort_compress_2d_keys,
    )
    from binary_spgemm_tpu.ops.counts import (
        sort_compress_counts_seps_2d, sort_compress_counts_seps_2d_keys,
        masked_counts_compress_seps_2d, masked_counts_compress_seps_2d_keys,
        masked_counts_sum_2d, masked_counts_sum_2d_keys,
    )
    from binary_spgemm_tpu.ops.fused import (
        _sort_compress_or_masked_seps_2d, _sort_compress_or_masked_seps_2d_keys,
    )

    for mod in (spgemm_mod, counts_mod, fused_mod):
        monkeypatch.setattr(mod, "packable", lambda *a: False)

    rng = np.random.default_rng(5)
    k, L, n_rows, n_cols, P = 6, 256, 40, 1000, 64
    bl = int(n_cols).bit_length()

    def stream():
        row = rng.integers(0, n_rows + 1, (k, L)).astype(np.int32)
        col = np.where(
            row < n_rows,
            rng.integers(0, n_cols, (k, L)),
            n_cols,
        ).astype(np.int32)
        # embed one separator per row id (sorts after its real cols)
        for c in range(k):
            row[c, :n_rows] = np.arange(n_rows)
            col[c, :n_rows] = n_cols
        return jnp.asarray(row), jnp.asarray(col)

    def pairs():
        r = rng.integers(0, n_rows + 1, (k, P)).astype(np.int32)
        c = np.where(
            r < n_rows, rng.integers(0, n_cols, (k, P)), n_cols
        ).astype(np.int32)
        return jnp.asarray(r), jnp.asarray(c)

    row, col = stream()
    key = (row << bl) | col
    f_row, f_col = pairs()
    d_row, d_col = pairs()

    def eq(a, b):
        """Compare outputs up to each chunk's valid count (the padding tail
        beyond nnz is unspecified: general pair forms pad with sentinels,
        keys forms with masked int32-max)."""
        a, b = [np.asarray(x) for x in a], [np.asarray(x) for x in b]
        nnz_a, nnz_b = a[-1], b[-1]
        assert np.array_equal(nnz_a, nnz_b)
        for x, y in zip(a[:-1], b[:-1]):
            assert x.shape == y.shape
            if x.ndim == 2 and x.shape[-1] >= nnz_a.max():
                for c in range(x.shape[0]):
                    m = nnz_a[c] if nnz_a.ndim else int(nnz_a)
                    assert np.array_equal(x[c, :m], y[c, :m])
            else:
                assert np.array_equal(x, y)

    eq(sort_compress_seps_2d(row, col, n_rows, n_cols),
       sort_compress_seps_2d_keys(key, n_rows, n_cols))
    eq(sort_compress_2d(row, col, n_rows, n_cols),
       sort_compress_2d_keys(key, n_rows, n_cols))
    eq(sort_compress_counts_seps_2d(row, col, n_rows, n_cols),
       sort_compress_counts_seps_2d_keys(key, n_rows, n_cols))
    eq(sort_compress_masked_seps_2d(row, col, f_row, f_col, n_rows, n_cols),
       sort_compress_masked_seps_2d_keys(key, f_row, f_col, n_rows, n_cols))
    eq(masked_counts_compress_seps_2d(
           row, col, f_row, f_col, n_rows, n_cols),
       masked_counts_compress_seps_2d_keys(
           key, f_row, f_col, n_rows, n_cols))
    assert np.array_equal(
        np.asarray(masked_counts_sum_2d(row, col, f_row, f_col,
                                        n_rows, n_cols)),
        np.asarray(masked_counts_sum_2d_keys(key, f_row, f_col,
                                             n_rows, n_cols)),
    )
    eq(_sort_compress_or_masked_seps_2d(
           row, col, d_row, d_col, f_row, f_col, n_rows, n_cols),
       _sort_compress_or_masked_seps_2d_keys(
           key, d_row, d_col, f_row, f_col, n_rows, n_cols))


def test_small_plan_dispatch_groups():
    # r5: batched plans <= SMALL_PLAN_SLOTS split into ~SMALL_PLAN_GROUPS
    # async dispatch groups (ab="group-overlap"); assemble() must stitch the
    # multi-group outputs bit-exactly, including the padded dummy tail
    from binary_spgemm_tpu.ops import ell as ell_mod
    from binary_spgemm_tpu.utils.oracle import spgemm_oracle

    a = BCSR.random(1 << 16, 1 << 16, 2.0, seed=31)
    ex = ell_mod.EllSpGEMMExecutor(
        a, a, batched=True, batched_slots_cap=ell_mod.BATCHED_MAX_SLOTS
    )
    assert ex.total_slots <= ell_mod.SMALL_PLAN_SLOTS
    assert ex.n_groups >= 2  # the split actually planned
    assert ex.assemble(ex.run()).equals(spgemm_oracle(a, a))
    # over the gate: single-group planning preserved
    s0 = ell_mod.SMALL_PLAN_SLOTS
    try:
        ell_mod.SMALL_PLAN_SLOTS = 0
        ex1 = ell_mod.EllSpGEMMExecutor(
            a, a, batched=True, batched_slots_cap=ell_mod.BATCHED_MAX_SLOTS
        )
    finally:
        ell_mod.SMALL_PLAN_SLOTS = s0
    assert ex1.n_groups == 1
    assert ex1.assemble(ex1.run()).equals(spgemm_oracle(a, a))
