"""End-to-end validity run on the committed fixture — ≡ ``make test``.

The reference's only automated test (final/Makefile:11-12) runs the hybrid
MPI+OpenMP binary on a committed 50000×50000 / ~25000-nnz pattern matrix with 4
ranks × 2 threads and bit-compares against a serial recompute.  Here: read the
(self-generated) fixture with reference ingest semantics, compute C = A·A on
the 8-device mesh AND serially, bit-compare both and the scipy oracle.
"""
import os

from binary_spgemm_tpu import read_pattern, spgemm
from binary_spgemm_tpu.parallel.dist_spgemm import dist_spgemm
from binary_spgemm_tpu.parallel.mesh import make_row_mesh
from binary_spgemm_tpu.utils.oracle import spgemm_oracle

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "validity_test.mtx")


def test_validity_fixture_end_to_end():
    a = read_pattern(FIXTURE)  # reference transpose semantics
    assert a.shape == (50000, 50000)
    assert 20000 < a.nnz < 30000
    c_serial = spgemm(a, a)
    c_dist = dist_spgemm(a, a, make_row_mesh())
    # ≡ "Results of serial and multicore are the same!"
    assert c_dist.equals(c_serial)
    assert c_serial.equals(spgemm_oracle(a, a))


def test_validity_fixture_cli(capsys):
    from binary_spgemm_tpu.cli import main

    assert main(["validate", FIXTURE, "--oracle"]) == 0
    assert "the same!" in capsys.readouterr().out
