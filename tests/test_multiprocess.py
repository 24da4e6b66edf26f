"""TRUE multi-process distributed execution (≡ ``mpirun -n 2`` locally).

The reference's only automated test runs its real MPI binary as multiple
processes on one machine (final/Makefile:11-12).  The equivalent here:
two OS processes, each a separate ``jax.distributed`` participant with its
own CPU devices, running the SAME SPMD ``dist_spgemm`` program over the
global mesh — collectives cross the process boundary over gRPC exactly as
they would cross hosts over DCN.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); coord = sys.argv[2]; mtx_path = sys.argv[3]
from binary_spgemm_tpu.parallel import multihost
multihost.initialize(
    coordinator_address=coord, num_processes=2, process_id=pid,
    local_device_ids=[0, 1],
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4
from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.parallel.dist_spgemm import dist_spgemm
from binary_spgemm_tpu.parallel import multihost as mh
mesh = mh.global_row_mesh()
a = BCSR.random(200, 200, 3.0, seed=5)  # replicated ingest (final:309)
mh.barrier("pre")
c = dist_spgemm(a, a, mesh)
mh.barrier("post")
from binary_spgemm_tpu.utils.oracle import spgemm_oracle
assert c.equals(spgemm_oracle(a, a)), "multiprocess result mismatch"
# masked SPMD path across the same two processes
from binary_spgemm_tpu.parallel.dist_spgemm import dist_masked_spgemm
from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle
f = BCSR.random(200, 200, 15.0, seed=6)
mh.barrier("pre-masked")
cm = dist_masked_spgemm(f, a, a, mesh)
mh.barrier("post-masked")
assert cm.equals(masked_spgemm_oracle(f, a, a)), "multiprocess masked mismatch"
# fully sharded ingest->multiply pipeline: THIS process reads only its own
# row slice of the shared file (read_pattern(row_range) + local staging)
import numpy as np
from binary_spgemm_tpu import read_pattern
from binary_spgemm_tpu.parallel.mesh import partition_rows
bounds = partition_rows(np.ones(a.n_rows), jax.device_count(), balance="rows")
lo, hi = mh.process_row_range(bounds, mesh)
a_local = read_pattern(mtx_path, transpose=False, row_range=(lo, hi))
assert a_local.shape == (hi - lo, a.n_cols)
mh.barrier("pre-local")
cl = mh.dist_spgemm_from_local(a_local, bounds, a, mesh)
mh.barrier("post-local")
assert cl.equals(c), "sharded-ingest pipeline mismatch"
# scalar-reduction SPMD op (dist_triangle_count): psum limbs cross gRPC
from binary_spgemm_tpu.parallel.dist_spgemm import dist_triangle_count
sp = a.to_scipy(); sp = ((sp + sp.T) > 0).astype("int64").tolil(); sp.setdiag(0)
g = BCSR.from_scipy(sp.tocsr())
mh.barrier("pre-tri")
t = dist_triangle_count(g, mesh)
mh.barrier("post-tri")
from binary_spgemm_tpu.ops.graph import triangle_count as _tc
assert t == _tc(g, device=False), "multiprocess triangle count mismatch"
print(f"proc {pid} OK nnz={c.nnz} masked_nnz={cm.nnz} local_ok=1 tri={t}", flush=True)
"""


def test_two_process_distributed(tmp_path):
    # shared .mtx fixture for the sharded-ingest pipeline (≡ the reference's
    # every-rank-reads-the-file setup, but each rank keeps only its slice)
    from binary_spgemm_tpu import BCSR, write_pattern

    mtx = tmp_path / "shared.mtx"
    write_pattern(mtx, BCSR.random(200, 200, 3.0, seed=5))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), coord, str(mtx)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out
