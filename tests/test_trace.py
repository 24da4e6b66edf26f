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


def test_bsr_roofline_model():
    from binary_spgemm_tpu.utils.trace import bsr_roofline, roofline

    rep = bsr_roofline(1000, 200, 128, 0.01)
    assert rep["model"] == "bsr-mxu"
    assert rep["model_flops"] == 2 * 1000 * 128**3
    assert rep["speed_of_light_s"] > 0
    assert rep["bound"] in ("compute", "bandwidth")
    # the sort model tags itself so sweep rows are attributable
    assert roofline(1 << 20, 1000, 1000, 0.01)["model"] == "sort"
