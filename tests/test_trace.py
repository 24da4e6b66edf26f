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


def test_roofline_dispatch_floor_adjustment():
    # on TPU devices the row carries the floor-adjusted fraction too (the
    # ~27 ms tunnel floor caps the raw fraction regardless of kernel speed);
    # off-TPU (this CPU test) the field is absent
    class FakeTpu:
        device_kind = "TPU v5 lite"

    r = roofline(1 << 20, 1000, 5000, 0.1, device=FakeTpu())
    assert r["dispatch_floor_s"] == 0.027
    expect = r["speed_of_light_s"] / (0.1 - 0.027)
    assert abs(r["fraction_ex_dispatch"] - expect) < 1e-12
    assert r["fraction_ex_dispatch"] > r["fraction_of_roofline"]
    # dual roofline: compute-bound sort term (measured VPU floor) raises the
    # achievable ceiling above the bandwidth-only SOL at these shapes
    assert r["sort_compute_s"] > 0
    want = max(r["speed_of_light_s"], r["sort_compute_s"]) / 0.1
    assert abs(r["fraction_of_dual"] - want) < 1e-12
    assert r["fraction_of_dual"] >= r["fraction_of_roofline"]
    # near/below the floor the adjusted fraction is meaningless — omitted
    assert "fraction_ex_dispatch" not in roofline(
        1 << 20, 1000, 5000, 0.02, device=FakeTpu()
    )
    assert "fraction_ex_dispatch" not in roofline(1 << 20, 1000, 5000, 0.1)


def test_bsr_roofline_model():
    from binary_spgemm_tpu.utils.trace import bsr_roofline, roofline

    rep = bsr_roofline(1000, 200, 128, 0.01)
    assert rep["model"] == "bsr-mxu"
    assert rep["model_flops"] == 2 * 1000 * 128**3
    assert rep["speed_of_light_s"] > 0
    assert rep["bound"] in ("compute", "bandwidth")
    # the sort model tags itself so sweep rows are attributable
    assert roofline(1 << 20, 1000, 1000, 0.01)["model"] == "sort"
