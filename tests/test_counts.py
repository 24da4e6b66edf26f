"""Counting SpGEMM (structure + multiplicities) vs scipy's integer product."""
import numpy as np
import pytest

from binary_spgemm_tpu import BCSR, masked_spgemm_counts, spgemm_counts
from binary_spgemm_tpu.ops.counts import triangle_count_device
from binary_spgemm_tpu.ops.graph import triangle_count


def _oracle(a: BCSR, b: BCSR):
    sp = a.to_scipy().astype(np.int64) @ b.to_scipy().astype(np.int64)
    sp.sort_indices()
    return sp


@pytest.mark.parametrize(
    "n,k,m,d,seed",
    [
        (120, 90, 150, 3.0, 0),
        (64, 64, 64, 5.0, 1),
        (300, 40, 300, 2.0, 2),
        (1, 50, 1, 4.0, 3),
    ],
)
def test_counts_match_integer_product(n, k, m, d, seed):
    a = BCSR.random(n, k, d, seed=seed)
    b = BCSR.random(k, m, d, seed=seed + 9)
    c, counts = spgemm_counts(a, b)
    ref = _oracle(a, b)
    np.testing.assert_array_equal(c.indptr, ref.indptr)
    np.testing.assert_array_equal(c.indices, ref.indices)
    np.testing.assert_array_equal(counts, ref.data)


def test_counts_chunked_matches():
    a = BCSR.random(400, 400, 6.0, seed=7)
    c1, k1 = spgemm_counts(a, a)
    c2, k2 = spgemm_counts(a, a, chunk_flops=4096)  # many chunks
    assert c1.equals(c2)
    np.testing.assert_array_equal(k1, k2)
    ref = _oracle(a, a)
    np.testing.assert_array_equal(k1, ref.data)


def test_counts_empty():
    a = BCSR(np.zeros(5, np.int32), np.zeros(0, np.int32), (4, 4))
    c, counts = spgemm_counts(a, a)
    assert c.nnz == 0 and counts.size == 0


def _sym_graph(n, d, seed):
    a = BCSR.random(n, n, d, seed=seed)
    sp = a.to_scipy()
    sp = ((sp + sp.T) > 0).astype(np.int64).tolil()
    sp.setdiag(0)
    return BCSR.from_scipy(sp.tocsr())


@pytest.mark.parametrize("n,d,seed", [(60, 4.0, 0), (200, 3.0, 1), (31, 8.0, 2)])
def test_triangle_count_device_matches_host(n, d, seed):
    a = _sym_graph(n, d, seed)
    host = triangle_count(a, device=False)
    assert triangle_count_device(a) == host
    assert triangle_count(a) == host  # default routes to device
    # chunked path agrees too
    assert triangle_count_device(a, chunk_flops=2048) == host


def test_triangle_count_k4_and_c4():
    k4 = BCSR.from_dense(~np.eye(4, dtype=bool))
    assert triangle_count_device(k4) == 4
    c4 = np.zeros((4, 4), bool)
    for i in range(4):
        c4[i, (i + 1) % 4] = c4[(i + 1) % 4, i] = True
    assert triangle_count_device(BCSR.from_dense(c4)) == 0


def test_triangle_count_rejects_asymmetric():
    # directed edge set: wedge sum not divisible by 6
    a = BCSR.from_dense(np.triu(~np.eye(4, dtype=bool)))
    with pytest.raises(ValueError, match="symmetric"):
        triangle_count_device(a)


def _masked_oracle(f: BCSR, a: BCSR, b: BCSR):
    prod = a.to_scipy().astype(np.int64) @ b.to_scipy().astype(np.int64)
    m = prod.multiply(f.to_scipy().astype(np.int64))
    m = m.tocsr()
    m.sort_indices()
    m.eliminate_zeros()
    return m


@pytest.mark.parametrize(
    "n,k,m,d,seed",
    [(100, 80, 120, 3.0, 0), (64, 64, 64, 5.0, 1), (200, 30, 200, 2.0, 2)],
)
def test_masked_counts_match_oracle(n, k, m, d, seed):
    from binary_spgemm_tpu import masked_spgemm_counts

    a = BCSR.random(n, k, d, seed=seed)
    b = BCSR.random(k, m, d, seed=seed + 5)
    f = BCSR.random(n, m, d * 4, seed=seed + 13)
    c, counts = masked_spgemm_counts(f, a, b)
    ref = _masked_oracle(f, a, b)
    np.testing.assert_array_equal(c.indptr, ref.indptr)
    np.testing.assert_array_equal(c.indices, ref.indices)
    np.testing.assert_array_equal(counts, ref.data)


def test_masked_counts_chunked_and_common_neighbors():
    from binary_spgemm_tpu import masked_spgemm_counts

    g = _sym_graph(150, 4.0, 5)
    c1, k1 = masked_spgemm_counts(g, g, g)
    c2, k2 = masked_spgemm_counts(g, g, g, chunk_flops=2048)
    assert c1.equals(c2)
    np.testing.assert_array_equal(k1, k2)
    # per-edge common-neighbor counts sum to 6 * triangles
    assert int(k1.sum()) == 6 * triangle_count(g, device=False)
    ref = _masked_oracle(g, g, g)
    np.testing.assert_array_equal(k1, ref.data)


def test_masked_counts_empty():
    from binary_spgemm_tpu import masked_spgemm_counts

    a = BCSR.random(10, 10, 2.0, seed=1)
    f = BCSR(np.zeros(11, np.int32), np.zeros(0, np.int32), (10, 10))
    c, counts = masked_spgemm_counts(f, a, a)
    assert c.nnz == 0 and counts.size == 0


def test_counts_nonpackable_paths():
    # n_cols so large the (row, col) pair can't pack into one int32 key:
    # exercises the 2-key counts compression and the 3-key tagged join
    from binary_spgemm_tpu import masked_spgemm_counts

    big = 3_000_000
    rng = np.random.default_rng(3)
    # A's columns and B's support concentrate in small ranges so candidate
    # pairs collide (multiplicities > 1) while the COLUMN SPACE stays wide
    a = BCSR.from_coo(
        rng.integers(0, 1024, 8000), rng.integers(0, 1000, 8000), (1024, big)
    ).sum_duplicates()
    b = BCSR.from_coo(
        rng.integers(0, 1000, 50_000),
        rng.integers(0, 2000, 50_000),
        (big, big),
    ).sum_duplicates()
    from binary_spgemm_tpu.ops.spgemm import packable

    assert not packable(1024, big) and not packable(1024, 2 * big + 1)
    c, counts = __import__("binary_spgemm_tpu").spgemm_counts(a, b)
    ref = _oracle(a, b)
    np.testing.assert_array_equal(c.indptr, ref.indptr)
    np.testing.assert_array_equal(c.indices, ref.indices)
    np.testing.assert_array_equal(counts, ref.data)
    f = BCSR.from_coo(
        rng.integers(0, 1024, 3000), rng.integers(0, big, 3000), (1024, big)
    ).sum_duplicates()
    cm, km = masked_spgemm_counts(f, a, b)
    refm = _masked_oracle(f, a, b)
    np.testing.assert_array_equal(cm.indptr, refm.indptr)
    np.testing.assert_array_equal(cm.indices, refm.indices)
    np.testing.assert_array_equal(km, refm.data)


def test_dist_triangle_count_matches():
    from binary_spgemm_tpu.parallel.dist_spgemm import dist_triangle_count
    from binary_spgemm_tpu.parallel.mesh import make_row_mesh

    mesh = make_row_mesh()
    for n, d, seed in [(100, 4.0, 0), (40, 6.0, 1), (7, 2.0, 2)]:
        g = _sym_graph(n, d, seed)
        want = triangle_count(g, device=False)
        assert dist_triangle_count(g, mesh) == want, (n, seed)
    # psum limb split: force a graph with a chunky wedge sum
    g = _sym_graph(300, 10.0, 3)
    assert dist_triangle_count(g, mesh) == triangle_count(g, device=False)
    # engine equivalence: forced ELL and forced ESC per-shard expansions
    want = triangle_count(g, device=False)
    assert dist_triangle_count(g, mesh, engine="ell") == want
    assert dist_triangle_count(g, mesh, engine="esc") == want


def test_clustering_coefficients():
    from binary_spgemm_tpu.ops.graph import clustering_coefficients

    # triangle 0-1-2 plus pendant 3 attached to 2, isolated 4
    dense = np.zeros((5, 5), bool)
    for i, j in [(0, 1), (1, 2), (0, 2), (2, 3)]:
        dense[i, j] = dense[j, i] = True
    cc = clustering_coefficients(BCSR.from_dense(dense))
    np.testing.assert_allclose(cc, [1.0, 1.0, 1 / 3, 0.0, 0.0])
    # random graph vs a direct dense oracle
    g = _sym_graph(80, 5.0, 9)
    d = g.to_dense().astype(np.int64)
    deg = d.sum(1)
    tri = np.einsum("ij,jk,ki->i", d, d, d)  # 2*triangles_at per node
    want = np.where(deg > 1, tri / np.maximum(deg * (deg - 1), 1), 0.0)
    np.testing.assert_allclose(clustering_coefficients(g), want)


def test_k_truss():
    from binary_spgemm_tpu.ops.graph import k_truss

    # K4 plus a pendant triangle sharing one node, plus a tail edge
    dense = np.zeros((8, 8), bool)
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),  # K4
             (3, 4), (4, 5), (3, 5),                          # triangle 3-4-5
             (5, 6), (6, 7)]                                  # tail
    for i, j in edges:
        dense[i, j] = dense[j, i] = True
    g = BCSR.from_dense(dense)
    t3 = k_truss(g, 3)   # drop tail edges, keep both triangles + K4
    want3 = dense.copy()
    for i, j in [(5, 6), (6, 7)]:
        want3[i, j] = want3[j, i] = False
    np.testing.assert_array_equal(t3.to_dense(), want3)
    t4 = k_truss(g, 4)   # only K4 survives (each K4 edge in 2 triangles)
    want4 = np.zeros_like(dense)
    for i, j in [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]:
        want4[i, j] = want4[j, i] = True
    np.testing.assert_array_equal(t4.to_dense(), want4)
    assert k_truss(g, 5).nnz == 0  # K4 edges have only 2 triangles each


def test_k_truss_peeling_oracle():
    # brute-force dense peeling oracle on random graphs
    from binary_spgemm_tpu.ops.graph import k_truss

    for seed in (0, 1):
        g = _sym_graph(60, 6.0, seed)
        for k in (3, 4):
            d = g.to_dense().astype(np.int64)
            while True:
                support = (d @ d) * d
                drop = (support < k - 2) & (d > 0)
                if not drop.any():
                    break
                d[drop] = 0
            np.testing.assert_array_equal(
                k_truss(g, k).to_dense(), d > 0, err_msg=f"{seed},{k}"
            )


def test_counts_canonicalise_duplicate_operands():
    # duplicate entries in A/B must NOT inflate multiplicities
    dup = BCSR.from_coo(
        np.array([0, 0, 1, 1, 1]), np.array([1, 1, 0, 2, 2]), (3, 3)
    )
    b = BCSR.from_dense(np.eye(3))
    c, counts = spgemm_counts(dup, b)
    assert counts.max() == 1  # pattern product of 0/1 matrices
    ref = _oracle(dup.sum_duplicates(), b)
    np.testing.assert_array_equal(counts, ref.data)


def test_counts_ell_executor_plans_match_esc():
    # the sliced-ELL counting kernels (contiguous AND dealt plans) vs the
    # forced-ESC path — bit-exact engine equivalence, ≡ the boolean engines'
    from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor

    a = BCSR.random(300, 260, 5.0, seed=11)
    b = BCSR.random(260, 340, 4.0, seed=12)
    c_esc, k_esc = spgemm_counts(a, b, chunk_flops=8192)
    for plan in ("contig", "deal"):
        ex = EllSpGEMMExecutor(a, b, row_chunks=plan)
        c, k = ex.assemble_counts(ex.run_counts())
        assert c.equals(c_esc), plan
        np.testing.assert_array_equal(k, k_esc, err_msg=plan)


def test_masked_counts_ell_matches_esc():
    from binary_spgemm_tpu import masked_spgemm_counts
    from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor

    a = BCSR.random(250, 200, 5.0, seed=3)
    b = BCSR.random(200, 250, 5.0, seed=4)
    f = BCSR.random(250, 250, 6.0, seed=5)
    c_esc, k_esc = masked_spgemm_counts(f, a, b, chunk_flops=8192)
    c_auto, k_auto = masked_spgemm_counts(f, a, b)  # ELL route
    assert c_auto.equals(c_esc)
    np.testing.assert_array_equal(k_auto, k_esc)
    for plan in ("contig", "deal"):
        ex = EllSpGEMMExecutor(a, b, row_chunks=plan, masked=True)
        c, k = ex.assemble_counts(ex.run_masked_counts(f))
        assert c.equals(c_esc), plan
        np.testing.assert_array_equal(k, k_esc, err_msg=plan)


def test_triangle_count_ell_matches_esc():
    from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor

    for seed in (0, 1):
        g = _sym_graph(150, 5.0, seed)
        t_auto = triangle_count_device(g)  # ELL route
        t_esc = triangle_count_device(g, chunk_flops=4096)
        assert t_auto == t_esc, seed
        # executor-level dealt plan
        ex = EllSpGEMMExecutor(g, g, row_chunks="deal", masked=True)
        sums = np.asarray(ex.run_counts_sum(g))
        assert int(sums[: ex.n_chunks].sum()) // 6 == t_esc, seed


def test_dist_spgemm_counts_matches():
    import scipy.sparse as ssp

    from binary_spgemm_tpu.parallel.dist_spgemm import (
        dist_masked_spgemm_counts,
        dist_spgemm_counts,
    )
    from binary_spgemm_tpu.parallel.mesh import make_row_mesh

    mesh = make_row_mesh()
    a = BCSR.random(600, 500, 4.0, seed=1)
    b = BCSR.random(500, 700, 4.0, seed=2)
    ref = _oracle(a, b)
    for eng in ("auto", "ell", "esc"):
        c, k = dist_spgemm_counts(a, b, mesh, engine=eng)
        got = ssp.csr_matrix((k, c.indices, c.indptr), shape=c.shape)
        assert (got != ref).nnz == 0, eng
    f = BCSR.random(600, 700, 5.0, seed=3)
    refm = ref.multiply(f.to_scipy().astype(bool)).tocsr()
    refm.sort_indices()
    refm.eliminate_zeros()
    for eng in ("auto", "ell", "esc"):
        c, k = dist_masked_spgemm_counts(f, a, b, mesh, engine=eng)
        got = ssp.csr_matrix((k, c.indices, c.indptr), shape=c.shape)
        got.eliminate_zeros()
        assert (got != refm).nnz == 0, eng
    # empty operand early-out
    e = BCSR(np.zeros(5, np.int32), np.zeros(0, np.int32), (4, 500))
    c, k = dist_spgemm_counts(e, b, mesh)
    assert c.nnz == 0 and k.size == 0


def test_counts_engine_kwarg():
    a = BCSR.random(60, 60, 3.0, seed=11)
    auto_c, auto_v = spgemm_counts(a, a)
    ell_c, ell_v = spgemm_counts(a, a, engine="ell")
    esc_c, esc_v = spgemm_counts(a, a, engine="esc", chunk_flops=200)
    assert ell_c.equals(auto_c) and np.array_equal(ell_v, auto_v)
    assert esc_c.equals(auto_c) and np.array_equal(esc_v, auto_v)
    m_auto, mv_auto = masked_spgemm_counts(a, a, a)
    m_ell, mv_ell = masked_spgemm_counts(a, a, a, engine="ell")
    assert m_ell.equals(m_auto) and np.array_equal(mv_ell, mv_auto)
    with pytest.raises(ValueError, match="unknown engine"):
        spgemm_counts(a, a, engine="bogus")
    with pytest.raises(ValueError, match="mutually exclusive"):
        spgemm_counts(a, a, engine="ell", chunk_flops=100)
    with pytest.raises(ValueError, match="mutually exclusive"):
        masked_spgemm_counts(a, a, a, engine="ell", chunk_flops=100)


def test_run_marks_no_packed_positions():
    # the run marks must not pack (pos << 1 | tag): it wraps int32 past
    # 2^30 positions (lengths the routers admit) and jnp.int64 silently
    # canonicalizes to int32 with x64 off — the two-cummax form uses plain
    # positions only
    import inspect

    from binary_spgemm_tpu.ops import counts as counts_mod

    src1 = inspect.getsource(counts_mod._masked_run_marks_1d)
    src2 = inspect.getsource(counts_mod._masked_run_marks_2d)
    assert "<< 1" not in src1 and "<< 1" not in src2

    import jax.numpy as jnp

    is_mask = jnp.asarray([1, 0, 0, 1, 0, 0], bool)
    new = jnp.asarray([1, 0, 1, 1, 0, 0], bool)
    # runs: [mask, cand], [cand], [mask, cand, cand]
    want = [True, True, False, True, True, True]
    got = counts_mod._masked_run_marks_1d(is_mask, new)
    assert list(map(bool, got)) == want
