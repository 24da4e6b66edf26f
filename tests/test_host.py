"""Host (CPU) small-flop engine: oracle parity, native/numpy equivalence,
and route pinning in the auto-routers."""
import subprocess
import sys

import numpy as np
import pytest

from binary_spgemm_tpu import BCSR, masked_spgemm, spgemm, spgemm_counts
from binary_spgemm_tpu.ops import host
from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle, spgemm_oracle


CASES = [
    (120, 90, 150, 3.0, 0),
    (64, 64, 64, 5.0, 1),
    (300, 40, 300, 2.0, 2),
    (1, 50, 1, 4.0, 3),
    (50, 50, 50, 0.0, 4),  # empty-ish
]


@pytest.mark.parametrize("n,k,m,d,seed", CASES)
def test_host_spgemm_oracle(n, k, m, d, seed):
    a = BCSR.random(n, k, d, seed=seed)
    b = BCSR.random(k, m, d, seed=seed + 100)
    assert host.host_spgemm(a, b).equals(spgemm_oracle(a, b))


@pytest.mark.parametrize("n,k,m,d,seed", CASES)
def test_host_masked_spgemm_oracle(n, k, m, d, seed):
    a = BCSR.random(n, k, d, seed=seed)
    b = BCSR.random(k, m, d, seed=seed + 100)
    f = BCSR.random(n, m, d + 1, seed=seed + 200)
    assert host.host_masked_spgemm(f, a, b).equals(
        masked_spgemm_oracle(f, a, b)
    )


@pytest.mark.parametrize("n,k,m,d,seed", CASES[:3])
def test_host_counts_oracle(n, k, m, d, seed):
    a = BCSR.random(n, k, d, seed=seed)
    b = BCSR.random(k, m, d, seed=seed + 100)
    c, counts = host.host_spgemm_counts(a, b)
    ref = a.to_scipy().astype(np.int64) @ b.to_scipy().astype(np.int64)
    ref.sort_indices()
    assert np.array_equal(np.asarray(c.indptr, np.int64), ref.indptr)
    assert np.array_equal(c.indices, ref.indices)
    assert np.array_equal(counts, ref.data)


def test_native_numpy_equivalence():
    """The numpy fallback must be pinned bit-exact to the native kernels."""
    from binary_spgemm_tpu import native

    if native.lib() is None:
        pytest.skip("no native toolchain")
    a = BCSR.random(200, 150, 4.0, seed=7)
    b = BCSR.random(150, 180, 3.0, seed=8)
    f = BCSR.random(200, 180, 5.0, seed=9)
    got_native = host.host_spgemm(a, b)
    got_masked = host.host_masked_spgemm(f, a, b)
    got_counts = host.host_spgemm_counts(a, b)
    # run the same inputs through a subprocess with native disabled
    code = """
import numpy as np
from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops import host
a = BCSR.random(200, 150, 4.0, seed=7)
b = BCSR.random(150, 180, 3.0, seed=8)
f = BCSR.random(200, 180, 5.0, seed=9)
c = host.host_spgemm(a, b)
m = host.host_masked_spgemm(f, a, b)
cc, cv = host.host_spgemm_counts(a, b)
np.savez("{out}", c_ptr=c.indptr, c_idx=c.indices,
         m_ptr=m.indptr, m_idx=m.indices,
         cc_ptr=cc.indptr, cc_idx=cc.indices, cv=cv)
"""
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "r.npz")
        env = dict(os.environ, BINARY_SPGEMM_NO_NATIVE="1", JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, "-c", code.format(out=out)],
            check=True, env=env, cwd="/root/repo",
        )
        r = np.load(out)
    assert np.array_equal(np.asarray(got_native.indptr, np.int64), r["c_ptr"])
    assert np.array_equal(got_native.indices, r["c_idx"])
    assert np.array_equal(np.asarray(got_masked.indptr, np.int64), r["m_ptr"])
    assert np.array_equal(got_masked.indices, r["m_idx"])
    assert np.array_equal(np.asarray(got_counts[0].indptr, np.int64), r["cc_ptr"])
    assert np.array_equal(got_counts[0].indices, r["cc_idx"])
    assert np.array_equal(got_counts[1], r["cv"])


def test_route_pinning(monkeypatch):
    """Small-flop inputs must route to the host engine; big ones must not."""
    calls = []
    real = host.host_spgemm
    monkeypatch.setattr(host, "host_spgemm", lambda a, b: calls.append(1) or real(a, b))
    small = BCSR.random(500, 500, 2.0, seed=5)  # ~2K flops
    c = spgemm(small, small)
    assert calls, "small input did not take the host route"
    assert c.equals(spgemm_oracle(small, small))
    # explicit chunk_flops forces the device ESC path
    calls.clear()
    c2 = spgemm(small, small, chunk_flops=10_000)
    assert not calls
    assert c2.equals(c)


def test_route_pinning_masked_and_counts(monkeypatch):
    calls = {"m": 0, "c": 0}
    real_m, real_c = host.host_masked_spgemm, host.host_spgemm_counts

    def spy_m(f, a, b):
        calls["m"] += 1
        return real_m(f, a, b)

    def spy_c(a, b):
        calls["c"] += 1
        return real_c(a, b)

    monkeypatch.setattr(host, "host_masked_spgemm", spy_m)
    monkeypatch.setattr(host, "host_spgemm_counts", spy_c)
    small = BCSR.random(400, 400, 2.0, seed=6)
    f = BCSR.random(400, 400, 3.0, seed=7)
    got = masked_spgemm(f, small, small)
    assert calls["m"] == 1
    assert got.equals(masked_spgemm_oracle(f, small, small))
    spgemm_counts(small, small)
    assert calls["c"] == 1
    # engine="ell" must bypass the host route
    spgemm_counts(small, small, engine="ell")
    assert calls["c"] == 1


def test_validity_fixture_routes_host():
    """The reference's own make-test class (n=50K, ~25K nnz) is the
    motivating case: it must route host and stay bit-exact."""
    a = BCSR.random(50_000, 50_000, 0.5, seed=42)
    from binary_spgemm_tpu.ops.spgemm import spgemm_flops

    assert spgemm_flops(a, a) <= host.HOST_MAX_FLOPS
    assert spgemm(a, a).equals(spgemm_oracle(a, a))


def test_host_spm_or_route_and_oracle(monkeypatch):
    """Small unions route to the host key-union (the device floor loses)
    and stay bit-exact; big unions stay on device."""
    import numpy as np

    from binary_spgemm_tpu.ops import host as host_mod
    from binary_spgemm_tpu.ops import union as union_mod
    from binary_spgemm_tpu.utils.oracle import union_oracle

    calls = {"u": 0}
    real = host_mod.host_spm_or

    def spy(a, b):
        calls["u"] += 1
        return real(a, b)

    monkeypatch.setattr(union_mod, "host_spm_or", spy, raising=False)
    # the router imports inside the function — patch the host module symbol
    monkeypatch.setattr(host_mod, "host_spm_or", spy)
    a = BCSR.random(3000, 3000, 2.0, seed=11)
    b = BCSR.random(3000, 3000, 1.0, seed=12)
    got = union_mod.spm_or(a, b)
    assert calls["u"] == 1
    assert got.equals(union_oracle(a, b))
    # over the nnz cap: device path (host not called)
    monkeypatch.setattr(host_mod, "HOST_OR_MAX_NNZ", 0)
    got2 = union_mod.spm_or(a, b)
    assert calls["u"] == 1
    assert got2.equals(got)


@pytest.mark.parametrize("with_mask", [False, True])
def test_host_spgemm_or_route_and_oracle(monkeypatch, with_mask):
    import numpy as np

    from binary_spgemm_tpu.ops import fused as fused_mod
    from binary_spgemm_tpu.ops import host as host_mod
    from binary_spgemm_tpu.utils.oracle import (
        masked_spgemm_oracle, spgemm_oracle, union_oracle)

    calls = {"f": 0}
    real = host_mod.host_spgemm_or

    def spy(d, a, b, mask=None):
        calls["f"] += 1
        return real(d, a, b, mask=mask)

    monkeypatch.setattr(host_mod, "host_spgemm_or", spy)
    a = BCSR.random(2000, 2000, 2.0, seed=31)
    d = BCSR.random(2000, 2000, 1.0, seed=32)
    f = BCSR.random(2000, 2000, 2.0, seed=33) if with_mask else None
    got = fused_mod.spgemm_or(d, a, a, mask=f)
    assert calls["f"] == 1
    prod = spgemm_oracle(a, a) if f is None else masked_spgemm_oracle(f, a, a)
    assert got.equals(union_oracle(d, prod))
    # over the cap: device path, same result
    monkeypatch.setattr(host_mod, "HOST_OR_MAX_NNZ", 0)
    got2 = fused_mod.spgemm_or(d, a, a, mask=f)
    assert calls["f"] == 1
    assert got2.equals(got)
