"""Single-process checks of the multi-host glue (full multi-host runs need a
pod; the SPMD program itself is exercised on the 8-device mesh in
test_parallel.py, the same local-validation strategy as the reference's
``mpirun -n 4`` on one machine)."""
import numpy as np

from binary_spgemm_tpu.parallel import multihost
from binary_spgemm_tpu.parallel.mesh import make_row_mesh, partition_rows


def test_global_row_mesh_spans_all_devices():
    mesh = multihost.global_row_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("rows",)


def test_barrier_single_process():
    multihost.barrier("test")  # no-op single process, must not hang


def test_process_row_range_covers_all_rows():
    mesh = make_row_mesh()
    bounds = partition_rows(np.ones(100), 8)
    r0, r1 = multihost.process_row_range(bounds, mesh)
    # single process owns all devices -> full range
    assert (r0, r1) == (0, 100)
