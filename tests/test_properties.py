"""Algebraic property tests — invariants the reference never tested formally."""
import numpy as np
import pytest

from binary_spgemm_tpu import (
    BCSR,
    masked_spgemm,
    spgemm,
    spgemm_or,
    spm_or,
)
from binary_spgemm_tpu.utils.oracle import spgemm_oracle


@pytest.mark.parametrize("seed", range(3))
def test_transpose_identity(seed):
    # (A·B)^T == B^T · A^T
    a = BCSR.random(120, 90, 3.0, seed=seed)
    b = BCSR.random(90, 150, 3.0, seed=seed + 7)
    lhs = spgemm(a, b).transpose().sum_duplicates()
    rhs = spgemm(b.transpose(), a.transpose())
    assert lhs.equals(rhs)


def test_identity_multiply():
    a = BCSR.random(80, 80, 3.0, seed=1)
    eye = BCSR.from_dense(np.eye(80))
    assert spgemm(eye, a).equals(a.sum_duplicates())
    assert spgemm(a, eye).equals(a.sum_duplicates())


def test_union_commutative_associative():
    x = BCSR.random(60, 60, 2.0, seed=2)
    y = BCSR.random(60, 60, 2.0, seed=3)
    z = BCSR.random(60, 60, 2.0, seed=4)
    assert spm_or(x, y).equals(spm_or(y, x))
    assert spm_or(spm_or(x, y), z).equals(spm_or(x, spm_or(y, z)))


def test_masked_subset_and_composition():
    a = BCSR.random(100, 100, 4.0, seed=5)
    f = BCSR.random(100, 100, 6.0, seed=6)
    full = spgemm(a, a)
    masked = masked_spgemm(f, a, a)
    # C_masked == F AND C_full (set intersection)
    inter = BCSR.from_dense(full.to_dense() & f.to_dense())
    assert masked.equals(inter)


def test_dor_is_union_of_product():
    a = BCSR.random(90, 90, 3.0, seed=7)
    d = BCSR.random(90, 90, 2.0, seed=8)
    assert spgemm_or(d, a, a).equals(spm_or(d, spgemm(a, a)))


def test_distributivity_over_union():
    # A·(B OR C) == (A·B) OR (A·C) for boolean semiring
    a = BCSR.random(70, 70, 3.0, seed=9)
    b = BCSR.random(70, 70, 2.0, seed=10)
    c = BCSR.random(70, 70, 2.0, seed=11)
    lhs = spgemm(a, spm_or(b, c))
    rhs = spm_or(spgemm(a, b), spgemm(a, c))
    assert lhs.equals(rhs)


def test_power_iteration_reachability():
    # A^4 structure == ((A^2)^2) structure — composition consistency
    a = BCSR.random(64, 64, 2.0, seed=12)
    a2 = spgemm(a, a)
    a4_a = spgemm(a2, a2)
    a4_b = spgemm(spgemm(a, a2), a)
    assert a4_a.equals(a4_b)
    assert a4_a.equals(spgemm_oracle(a2, a2))


def test_overflow_guard():
    from binary_spgemm_tpu.ops.spgemm import uniform_chunk_plan

    # a synthetic row-flop vector exceeding int32 must raise, not wrap
    a = BCSR.random(4, 4, 1.0, seed=0)
    rf = np.array([2**32, 1, 1, 1], dtype=np.int64)
    with pytest.raises(OverflowError):
        uniform_chunk_plan(a, rf, 1 << 25, 4)


def test_engines_cross_parity_fuzz():
    """ESC and sliced-ELL must agree bit-exactly with each other and scipy on
    randomized shapes, densities, and structures."""
    import numpy as np

    from binary_spgemm_tpu import BCSR
    from binary_spgemm_tpu.ops.ell import ell_spgemm
    from binary_spgemm_tpu.ops.spgemm import DEFAULT_CHUNK_FLOPS, spgemm
    from binary_spgemm_tpu.utils.oracle import spgemm_oracle

    rng = np.random.default_rng(99)
    for trial in range(8):
        n = int(rng.integers(1, 400))
        m = int(rng.integers(1, 400))
        k = int(rng.integers(1, 400))
        d = float(rng.uniform(0.1, 6.0))
        a = BCSR.random(n, k, d, seed=trial)
        b = BCSR.random(k, m, d, seed=trial + 100)
        ref = spgemm_oracle(a, b)
        esc = spgemm(a, b, chunk_flops=DEFAULT_CHUNK_FLOPS)  # force ESC
        ell = ell_spgemm(a, b)
        assert esc.equals(ref), (trial, n, k, m, d)
        assert ell.equals(ref), (trial, n, k, m, d)


def test_masked_engines_cross_parity_fuzz():
    """Masked multiply must agree across ELL join, ESC join, and scipy."""
    import numpy as np

    from binary_spgemm_tpu import BCSR, masked_spgemm
    from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle

    rng = np.random.default_rng(123)
    for trial in range(6):
        n = int(rng.integers(30, 300))
        d = float(rng.uniform(0.5, 5.0))
        a = BCSR.random(n, n, d, seed=trial)
        f = BCSR.random(n, n, d / 2 + 0.5, seed=trial + 7)
        ref = masked_spgemm_oracle(f, a, a)
        assert masked_spgemm(f, a, a).equals(ref), trial
        ex = EllSpGEMMExecutor(a, a, row_chunks=3)
        assert ex.assemble(ex.run_masked(f)).equals(ref), trial


def test_dist_engines_cross_parity_fuzz():
    """Distributed masked/fused ops must agree across ESC and sliced-ELL
    per-shard expansions and the serial oracle on randomized rectangular
    shapes (≡ the single-chip fuzz, over the 8-device mesh)."""
    from binary_spgemm_tpu.parallel.dist_spgemm import (
        dist_masked_spgemm,
        dist_spgemm_or,
    )
    from binary_spgemm_tpu.parallel.mesh import make_row_mesh
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle

    rng = np.random.default_rng(321)
    mesh = make_row_mesh()
    for trial in range(3):
        n = int(rng.integers(30, 300))
        m = int(rng.integers(30, 300))
        k = int(rng.integers(30, 300))
        d = float(rng.uniform(0.5, 4.0))
        a = BCSR.random(n, k, d, seed=trial + 11)
        b = BCSR.random(k, m, d, seed=trial + 22)
        f = BCSR.random(n, m, d * 3, seed=trial + 33)
        dd = BCSR.random(n, m, d, seed=trial + 44)
        ref_m = masked_spgemm_oracle(f, a, b)
        ref_or = spm_or(dd, masked_spgemm(f, a, b))
        for eng in ("esc", "ell"):
            cm = dist_masked_spgemm(f, a, b, mesh, engine=eng)
            assert cm.equals(ref_m), (trial, eng)
            co = dist_spgemm_or(dd, a, b, mesh, mask=f, engine=eng)
            assert co.equals(ref_or), (trial, eng)


def test_degenerate_shapes_vs_oracle():
    # 1-row/1-col/empty/full operands through every single-chip op
    rng = np.random.default_rng(0)
    shapes = [(1, 1), (1, 5), (5, 1), (7, 3), (1, 64), (128, 2)]
    for (n, k) in shapes:
        for da, db in [(0.0, 1.0), (1.0, 0.0), (3.0, 3.0)]:
            a = BCSR.random(n, k, da, seed=int(rng.integers(1 << 30)))
            b = BCSR.random(k, n, db, seed=int(rng.integers(1 << 30)))
            assert spgemm(a, b).equals(spgemm_oracle(a, b)), (n, k, da, db)


def test_degenerate_square_ops_vs_oracle():
    rng = np.random.default_rng(1)
    for n in (1, 2, 7):
        a = BCSR.random(n, n, 1.5, seed=int(rng.integers(1 << 30)))
        b = BCSR.random(n, n, 1.5, seed=int(rng.integers(1 << 30)))
        f = BCSR.random(n, n, 1.0, seed=int(rng.integers(1 << 30)))
        d = BCSR.random(n, n, 0.5, seed=int(rng.integers(1 << 30)))
        sp = lambda m: m.to_scipy()
        assert masked_spgemm(f, a, b).equals(
            BCSR.from_scipy(sp(f).multiply(sp(a) @ sp(b)).astype(bool).tocsr())
        ), n
        assert spm_or(a, f).equals(
            BCSR.from_scipy((sp(a) + sp(f)).astype(bool).tocsr())
        ), n
        assert spgemm_or(d, a, b).equals(
            BCSR.from_scipy((sp(d) + (sp(a) @ sp(b))).astype(bool).tocsr())
        ), n


def test_dist_degenerate_sizes():
    # fewer rows than devices: empty shards through the SPMD assembly
    from binary_spgemm_tpu.parallel.dist_spgemm import dist_spgemm
    from binary_spgemm_tpu.parallel.mesh import make_row_mesh

    mesh = make_row_mesh()
    for n in (1, 2, 7):
        a = BCSR.random(n, n, 2.0, seed=n)
        for layout in ("replicated", "ring"):
            c = dist_spgemm(a, a, mesh, b_layout=layout)
            assert c.equals(spgemm_oracle(a, a)), (n, layout)


def test_routing_boundary_fuzz():
    """Fuzz the auto-route across its decision boundaries — batched vs
    unrolled (prefer_batched at 2^16 rows, monkeypatch-free via shapes),
    skew-guarded inputs, host small-flop/union routes — every result
    bit-exact vs the oracle regardless of which engine served it."""
    import numpy as np

    from binary_spgemm_tpu import spgemm, spm_or
    from binary_spgemm_tpu.utils.oracle import union_oracle

    rng = np.random.default_rng(77)
    for trial in range(6):
        kind = trial % 3
        if kind == 0:  # uniform, spans the host/device flop boundary
            n = int(rng.integers(2_000, 60_000))
            d = float(rng.uniform(0.3, 3.0))
            a = BCSR.random(n, n, d, seed=int(rng.integers(1 << 16)))
        elif kind == 1:  # power-law skew (dealt-plan / guard territory)
            a = BCSR.rmat(12, 6.0, seed=int(rng.integers(1 << 16)))
        else:  # rectangular
            n, m = int(rng.integers(1_000, 8_000)), int(rng.integers(1_000, 8_000))
            a = BCSR.random(n, m, 2.0, seed=int(rng.integers(1 << 16)))
            b = BCSR.random(m, n, 2.0, seed=int(rng.integers(1 << 16)))
            assert spgemm(a, b).equals(spgemm_oracle(a, b)), trial
            continue
        assert spgemm(a, a).equals(spgemm_oracle(a, a)), trial
        f = BCSR.random(*a.shape, 1.0, seed=int(rng.integers(1 << 16)))
        assert spm_or(a, f).equals(union_oracle(a, f)), trial
