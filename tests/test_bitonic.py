"""Pallas bitonic row sort: network correctness (interpret mode), the
trace-time eligibility gate, and the production fallback contract."""
import numpy as np
import pytest

from binary_spgemm_tpu.ops import bitonic


@pytest.mark.parametrize("k,L", [(16, 256), (8, 1024), (24, 512)])
def test_bitonic_network_matches_npsort(k, L):
    import jax.numpy as jnp

    rng = np.random.default_rng(k * L)
    # include duplicates and the int32 extremes the engine uses as sentinels
    x = rng.integers(0, 50, (k, L)).astype(np.int32)
    x[0, :3] = np.iinfo(np.int32).max
    x[1, :2] = -(1 << 31)
    got = np.asarray(bitonic.bitonic_sort_rows(jnp.asarray(x), interpret=True))
    assert np.array_equal(got, np.sort(x, axis=1))


def test_eligibility_gate(monkeypatch):
    # CPU backend (this test env) is never eligible
    assert not bitonic.eligible(128, 4096)
    # on TPU: the window is exactly L=4096 (round-4 recalibration vs the
    # UNSTABLE lax.sort the engines use — XLA wins at L<=2048, micro.jsonl
    # bench="sort_rate_table"), block-divisible k
    monkeypatch.setattr(bitonic, "_on_tpu", lambda: True)
    assert bitonic.eligible(128, 4096)
    assert not bitonic.eligible(128, 2048)  # XLA unstable sort faster
    assert not bitonic.eligible(8, 256)  # XLA 4x faster (0.044 vs 0.169)
    assert not bitonic.eligible(128, 4096 + 32)  # non-pow2 L
    assert not bitonic.eligible(128, 8192)  # pathological Mosaic compile
    assert not bitonic.eligible(129, 4096)  # no block divides k
    assert bitonic.eligible(32768, 4096)  # L=4096 runs at block<=32
    monkeypatch.setenv("BSPGEMM_PALLAS_SORT", "0")
    assert not bitonic.eligible(128, 4096)  # kill switch


def test_block_cap_by_length():
    # measured-safe VMEM budget: [128, 2048] ok, [128, 4096] crashed the
    # remote Mosaic compiler -> capped at 32 (block=64 measured slower too:
    # 0.0603 vs 0.0571 at [32768, 4096], results.jsonl ab="pallas-sort")
    assert bitonic._pick_block(32768, 2048) == 128
    assert bitonic._pick_block(32768, 4096) == 32
    assert bitonic._pick_block(16, 4096) == 16
    assert bitonic._pick_block(129, 4096) is None


def test_sort_rows_fallback_is_lax_sort():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 30, (6, 320), dtype=np.int32)  # ineligible shape
    got = np.asarray(bitonic.sort_rows(jnp.asarray(x)))
    assert np.array_equal(got, np.sort(x, axis=1))


def test_fused_sort_compress_matches_unfused():
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    k, L, limit = 16, 512, 400
    # duplicates + values at/above the limit (the demote band)
    x = rng.integers(0, 500, (k, L)).astype(np.int32)
    got = np.asarray(
        bitonic.fused_sort_compress(jnp.asarray(x), limit, interpret=True)
    )
    sent = np.iinfo(np.int32).max
    for r in range(k):
        s = np.sort(x[r])
        keep = np.concatenate([[True], s[1:] != s[:-1]]) & (s < limit)
        want = np.sort(np.where(keep, s, sent))
        assert np.array_equal(got[r], want), r
    # the caller's count formula
    nnz = (got < limit).sum(axis=1)
    for r in range(k):
        assert nnz[r] == len(np.unique(x[r][x[r] < limit]))


def test_stage_count():
    # m(m+1)/2 compare-exchange stages for L = 2^m
    assert len(bitonic._stages(2048)) == 11 * 12 // 2
    assert len(bitonic._stages(2)) == 1
