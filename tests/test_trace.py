import jax.numpy as jnp

from binary_spgemm_tpu.utils.trace import phase_timer, roofline


def test_phase_timer():
    pt = phase_timer()
    with pt("a"):
        x = jnp.arange(1000) * 2
    with pt("b"):
        _ = x + 1
    assert [r.name for r in pt.records] == ["a", "b"]
    assert all(r.seconds >= 0 for r in pt.records)
    rep = pt.report()
    assert "a" in rep and "ms" in rep


def test_roofline_fields():
    r = roofline(1 << 20, 1000, 5000, 0.01)
    assert 0 < r["fraction_of_roofline"]
    assert r["model_bytes"] > 60 * (1 << 20)
