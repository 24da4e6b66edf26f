import jax

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops.spgemm import DeviceBCSR, pad_bucket, spgemm_flops
from binary_spgemm_tpu.ops.device_api import (
    flops_bound_device,
    spgemm_device,
    spm_or_device,
)
from binary_spgemm_tpu.utils.oracle import spgemm_oracle, union_oracle


def test_device_roundtrip():
    a = BCSR.random(100, 80, 3.0, seed=0)
    d = DeviceBCSR.from_host(a)
    assert d.to_host().equals(a)


def test_flops_bound_device():
    a = BCSR.random(200, 200, 4.0, seed=1)
    d = DeviceBCSR.from_host(a)
    assert int(flops_bound_device(d, d)) == spgemm_flops(a, a)


def test_spgemm_device_matches_oracle():
    a = BCSR.random(300, 300, 3.0, seed=2)
    d = DeviceBCSR.from_host(a)
    fp = pad_bucket(spgemm_flops(a, a))
    c = jax.jit(
        lambda x: spgemm_device(x, x, flops_pad=fp)
    )(d)
    assert c.to_host().equals(spgemm_oracle(a, a))


def test_device_chain_stays_on_device():
    # (A·A) OR A without any host sync in between
    a = BCSR.random(150, 150, 2.0, seed=3)
    d = DeviceBCSR.from_host(a)
    fp = pad_bucket(spgemm_flops(a, a))

    @jax.jit
    def chain(x):
        c = spgemm_device(x, x, flops_pad=fp)
        return spm_or_device(c, x)

    out = chain(d)
    expected = union_oracle(spgemm_oracle(a, a), a)
    assert out.to_host().equals(expected)
