import numpy as np
import pytest

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.formats.bbcsr import BlockedBCSR
from binary_spgemm_tpu.ops.bsr import bsr_spgemm, block_pairs
from binary_spgemm_tpu.utils.oracle import spgemm_oracle


def blocked_matrix(n, b, nblocks_per_row, seed=0, block_density=0.3):
    """Random block-clustered matrix (the structure class where blocking wins)."""
    rng = np.random.default_rng(seed)
    nb = n // b
    rows, cols = [], []
    for i in range(nb):
        for j in rng.choice(nb, size=min(nblocks_per_row, nb), replace=False):
            k = max(1, int(block_density * b * b))
            r = rng.integers(0, b, k)
            c = rng.integers(0, b, k)
            rows.append(i * b + r)
            cols.append(j * b + c)
    return BCSR.from_coo(
        np.concatenate(rows), np.concatenate(cols), (n, n)
    ).sum_duplicates()


def test_roundtrip():
    mat = blocked_matrix(256, 64, 2, seed=1)
    blk = BlockedBCSR.from_bcsr(mat, 64)
    assert blk.to_bcsr().equals(mat)
    assert blk.nnz == mat.nnz


def test_roundtrip_nonmultiple_shape():
    # element shape not a multiple of block size: ragged edge blocks
    mat = BCSR.random(100, 70, 3.0, seed=2).sum_duplicates()
    blk = BlockedBCSR.from_bcsr(mat, 32)
    assert blk.to_bcsr().equals(mat)


def test_block_pairs_counts():
    a = blocked_matrix(128, 64, 2, seed=3)
    ab = BlockedBCSR.from_bcsr(a, 64)
    ka, kb, seg, obr, obc = block_pairs(ab, ab)
    assert len(ka) == len(kb) == len(seg)
    assert (np.diff(seg) >= 0).all()  # sorted by output block
    assert len(obr) == seg.max() + 1 if len(seg) else True


@pytest.mark.parametrize("b", [32, 64])
def test_bsr_spgemm_matches_oracle(b):
    a = blocked_matrix(256, b, 2, seed=4)
    ab = BlockedBCSR.from_bcsr(a, b)
    c = bsr_spgemm(ab, ab)
    assert c.to_bcsr().equals(spgemm_oracle(a, a))


def test_bsr_spgemm_rectangular():
    rng = np.random.default_rng(5)
    a = BCSR.random(96, 64, 4.0, seed=5).sum_duplicates()
    bmat = BCSR.random(64, 128, 4.0, seed=6).sum_duplicates()
    c = bsr_spgemm(BlockedBCSR.from_bcsr(a, 32), BlockedBCSR.from_bcsr(bmat, 32))
    assert c.to_bcsr().equals(spgemm_oracle(a, bmat))


def test_bsr_spgemm_empty():
    e = BCSR.from_dense(np.zeros((64, 64)))
    be = BlockedBCSR.from_bcsr(e, 32)
    c = bsr_spgemm(be, be)
    assert c.to_bcsr().nnz == 0


def test_bsr_many_pairs_chunking():
    # more pairs than one PAIR_CHUNK to exercise the chunk loop
    a = blocked_matrix(512, 32, 6, seed=7, block_density=0.1)
    ab = BlockedBCSR.from_bcsr(a, 32)
    ka, _, _, _, _ = block_pairs(ab, ab)
    from binary_spgemm_tpu.ops import bsr as bsr_mod

    assert len(ka) > bsr_mod.PAIR_CHUNK
    c = bsr_spgemm(ab, ab)
    assert c.to_bcsr().equals(spgemm_oracle(a, a))


@pytest.mark.parametrize("backend", ["pallas", "xla"])
def test_backends_agree(backend):
    a = blocked_matrix(256, 64, 2, seed=11)
    ab = BlockedBCSR.from_bcsr(a, 64)
    c = bsr_spgemm(ab, ab, backend=backend)
    assert c.to_bcsr().equals(spgemm_oracle(a, a))


def test_backend_validation():
    a = blocked_matrix(128, 64, 1, seed=12)
    ab = BlockedBCSR.from_bcsr(a, 64)
    with pytest.raises(ValueError):
        bsr_spgemm(ab, ab, backend="cuda")


def test_bsr_masked():
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle
    a = blocked_matrix(256, 64, 2, seed=20)
    f = blocked_matrix(256, 64, 3, seed=21)
    ab = BlockedBCSR.from_bcsr(a, 64)
    fb = BlockedBCSR.from_bcsr(f, 64)
    c = bsr_spgemm(ab, ab, mask=fb)
    assert c.to_bcsr().equals(masked_spgemm_oracle(f, a, a))


def test_bsr_masked_empty_mask():
    a = blocked_matrix(128, 64, 2, seed=22)
    ab = BlockedBCSR.from_bcsr(a, 64)
    empty = BlockedBCSR.from_bcsr(BCSR.from_dense(np.zeros((128, 128))), 64)
    c = bsr_spgemm(ab, ab, mask=empty)
    assert c.to_bcsr().nnz == 0


def test_bsr_masked_shape_check():
    a = blocked_matrix(128, 64, 1, seed=23)
    ab = BlockedBCSR.from_bcsr(a, 64)
    wrong = BlockedBCSR.from_bcsr(BCSR.from_dense(np.zeros((128, 128))), 32)
    with pytest.raises(ValueError):
        bsr_spgemm(ab, ab, mask=wrong)


def test_bsr_executor_matches_one_shot():
    from binary_spgemm_tpu.ops.bsr import BsrExecutor

    a = BCSR.random_blocked(512, 128, 1.5, 0.2, seed=8)
    blk = BlockedBCSR.from_bcsr(a, 128)
    ref = bsr_spgemm(blk, blk).to_bcsr()
    ex = BsrExecutor(blk, blk)
    got = ex.assemble(ex.run()).to_bcsr()
    assert got.equals(ref)
    # reuse
    got2 = ex.assemble(ex.run()).to_bcsr()
    assert got2.equals(ref)


def test_auto_routes_blocked_to_bsr():
    # VERDICT r04 ask #2: staged auto paths consult the MXU engine
    from binary_spgemm_tpu.ops.bsr import BsrStagedExecutor, maybe_bsr_executor
    from binary_spgemm_tpu.ops.ell import auto_executor, cached_executor

    a = BCSR.random_blocked(4096, 128, 2.0, 0.3, seed=3)
    ex = auto_executor(a, a)
    assert isinstance(ex, BsrStagedExecutor)
    c = ex.assemble(ex.run())
    assert c.equals(spgemm_oracle(a, a))
    # repeated runs on the staged executor agree
    assert ex.assemble(ex.run()).equals(c)
    # cached_executor: BSR only when the caller opts in (op-family callers
    # need run_or/run_masked/run_counts, which BSR does not serve)
    ex2 = cached_executor(a, a, allow_bsr=True)
    assert isinstance(ex2, BsrStagedExecutor)
    assert cached_executor(a, a, allow_bsr=True) is ex2  # identity hit
    exf = cached_executor(a, a)
    assert not isinstance(exf, BsrStagedExecutor)
    # uniform input: the screen rejects, sort engines serve it
    u = BCSR.random(4096, 4096, 40.0, seed=1)
    assert maybe_bsr_executor(u, u) is None


def test_spgemm_auto_bsr_bit_exact():
    from binary_spgemm_tpu.ops.spgemm import spgemm

    a = BCSR.random_blocked(4096, 128, 2.0, 0.3, seed=13)
    assert spgemm(a, a).equals(spgemm_oracle(a, a))


def test_blocked_route_opt_in():
    from binary_spgemm_tpu.ops.spgemm import blocked_route

    a = BCSR.random_blocked(4096, 128, 2.0, 0.3, seed=3)
    c = blocked_route(a, a)
    assert c is not None and c.equals(spgemm_oracle(a, a))
    # uniform input: not clustered enough
    u = BCSR.random(4096, 4096, 40.0, seed=1)
    assert blocked_route(u, u) is None
    # too small to bother
    s = BCSR.random_blocked(1024, 128, 2.0, 0.3, seed=3)
    assert blocked_route(s, s) is None
