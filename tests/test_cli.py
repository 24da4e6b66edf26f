import json

import pytest

from binary_spgemm_tpu import BCSR, write_pattern
from binary_spgemm_tpu.cli import main


@pytest.fixture
def mtx(tmp_path):
    mat = BCSR.random(200, 200, 2.0, seed=1)
    p = tmp_path / "a.mtx"
    write_pattern(p, mat)
    return str(p)


def test_gen_then_validate(tmp_path, capsys):
    out = str(tmp_path / "g.mtx")
    assert main(["gen", out, "-n", "300", "-d", "1.5", "--seed", "9"]) == 0
    assert main(["validate", out, "--oracle"]) == 0
    captured = capsys.readouterr()
    # the reference's confirm message (final/SpGEMM_mpi_omp_validity.c:340)
    assert "Results of serial and multicore are the same!" in captured.out


def test_bench_csv_schema(mtx, capsys):
    assert main(["bench", mtx, "--times", "2", "--json"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    csv = out[0].split(",")
    # tasks,threads,total_cpus,blocksize,path,n,input_nnz,output_nnz,mean,median,fastest
    assert len(csv) == 11
    assert csv[4] == mtx
    assert int(csv[5]) == 200
    assert float(csv[8]) > 0 and float(csv[10]) <= float(csv[8]) * 1.5
    rec = json.loads(out[1])
    assert rec["n"] == 200 and rec["output_nnz"] == int(csv[7])
    assert rec["output_nnz_per_s"] > 0


def test_bench_multidevice(mtx, capsys):
    assert main(["bench", mtx, "--times", "1", "--devices", "4"]) == 0
    csv = capsys.readouterr().out.strip().splitlines()[0].split(",")
    assert csv[0] == "4"


def test_bench_rejects_rectangular(tmp_path, capsys):
    mat = BCSR.random(20, 30, 1.0, seed=0)
    p = tmp_path / "r.mtx"
    write_pattern(p, mat)
    assert main(["bench", str(p), "--no-transpose"]) == 2


def test_bench_tune(mtx, capsys):
    # --tune measures the model's plausible-best batched plans and benches
    # the winner (staged executor)
    assert main(["bench", mtx, "--tune", "--times", "1", "--json"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out[0].split(",")) == 11  # same CSV contract
    assert json.loads(out[1])["output_nnz"] > 0


def test_validate_rows_balance(mtx):
    assert main(["validate", mtx, "--balance", "rows", "--devices", "2"]) == 0


def test_bench_blocksize_sweep(mtx, capsys):
    assert main(["bench", mtx, "--times", "1", "--sweep", "4096,16384"]) == 0
    lines = [
        l for l in capsys.readouterr().out.strip().splitlines() if "," in l
    ]
    assert len(lines) == 2
    assert lines[0].split(",")[3] == "4096"
    assert lines[1].split(",")[3] == "16384"


def test_validate_sharded_b(mtx):
    assert main(["validate", mtx, "--devices", "4", "--b-layout", "sharded"]) == 0


def test_multiply_writes_result(mtx, tmp_path, capsys):
    import numpy as np

    from binary_spgemm_tpu.io.mmio import read_pattern
    from binary_spgemm_tpu.utils.oracle import spgemm_oracle

    out = str(tmp_path / "c.mtx")
    assert main(["multiply", mtx, "--out", out]) == 0
    a = read_pattern(mtx)
    c = read_pattern(out, transpose=False)  # written as-is
    assert c.equals(spgemm_oracle(a, a))
    # masked + fused-OR variants
    f = str(tmp_path / "f.mtx")
    d = str(tmp_path / "d.mtx")
    write_pattern(f, BCSR.random(200, 200, 3.0, seed=5))
    write_pattern(d, BCSR.random(200, 200, 1.0, seed=6))
    assert main(["multiply", mtx, "--mask", f]) == 0
    assert main(["multiply", mtx, "--fuse-or", d, "--mask", f]) == 0
    assert main(["multiply", mtx, "--engine", "esc", "--chunk-flops", "4096"]) == 0
    assert "nnz=" in capsys.readouterr().out


def test_graph_commands(mtx, tmp_path, capsys):
    from binary_spgemm_tpu.io.mmio import read_pattern
    from binary_spgemm_tpu.ops.graph import transitive_closure

    out = str(tmp_path / "r.mtx")
    assert main(["graph", mtx, "closure", "--out", out]) == 0
    a = read_pattern(mtx)
    assert read_pattern(out, transpose=False).equals(transitive_closure(a))
    assert main(["graph", mtx, "khop", "--k", "3"]) == 0
    assert main(["graph", mtx, "khop", "--k", "2", "--device"]) == 0
    assert main(["graph", mtx, "triangles"]) == 0
    assert "triangles:" in capsys.readouterr().out


def test_graph_bfs_command(mtx, capsys):
    import numpy as np

    from binary_spgemm_tpu.io.mmio import read_pattern
    from binary_spgemm_tpu.ops.graph import bfs_levels

    assert main(["graph", mtx, "bfs", "--sources", "0,5"]) == 0
    out = capsys.readouterr().out
    lv = np.array([int(x) for x in out.strip().splitlines()[-1].split(",")])
    np.testing.assert_array_equal(lv, bfs_levels(read_pattern(mtx), [0, 5]))
    assert main(["graph", mtx, "bfs"]) == 2  # --sources required
    assert main(["graph", mtx, "bfs", "--sources", "1", "--device"]) == 2
    assert main(["graph", mtx, "bfs", "--sources", "0,x"]) == 2  # not ints


def test_graph_triangle_count(tmp_path, capsys):
    import numpy as np

    from binary_spgemm_tpu import BCSR, write_pattern

    k4 = BCSR.from_dense(~np.eye(4, dtype=bool))
    p = str(tmp_path / "k4.mtx")
    write_pattern(p, k4)
    assert main(["graph", p, "triangles", "--count", "--no-transpose"]) == 0
    assert "count=4" in capsys.readouterr().out


def test_graph_ktruss(tmp_path, capsys):
    import numpy as np

    from binary_spgemm_tpu import BCSR, write_pattern
    from binary_spgemm_tpu.io.mmio import read_pattern

    dense = np.zeros((5, 5), bool)
    for i, j in [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]:
        dense[i, j] = dense[j, i] = True
    p = str(tmp_path / "g.mtx")
    write_pattern(p, BCSR.from_dense(dense))
    out = str(tmp_path / "t.mtx")
    rc = main(["graph", p, "ktruss", "--k", "3", "--no-transpose", "--out", out])
    assert rc == 0
    assert read_pattern(out, transpose=False).nnz == 6  # the triangle only
    assert main(["graph", p, "ktruss", "--k", "2"]) == 2
    assert main(["graph", p, "ktruss", "--k", "3", "--device"]) == 2


def test_graph_bfs_out_file(mtx, tmp_path, capsys):
    import numpy as np

    from binary_spgemm_tpu.io.mmio import read_pattern
    from binary_spgemm_tpu.ops.graph import bfs_levels

    out = str(tmp_path / "levels.csv")
    assert main(["graph", mtx, "bfs", "--sources", "2", "--out", out]) == 0
    assert out in capsys.readouterr().out
    lv = np.array([int(x) for x in open(out).read().strip().split(",")])
    np.testing.assert_array_equal(lv, bfs_levels(read_pattern(mtx), 2))


def test_multiply_counts_writes_integer_mtx(mtx, tmp_path, capsys):
    import numpy as np

    from binary_spgemm_tpu import read_pattern

    out = str(tmp_path / "counts.mtx")
    assert main(["multiply", mtx, "--counts", "--out", out]) == 0
    msg = capsys.readouterr().out
    assert "sum(counts)=" in msg
    with open(out) as fh:
        banner = fh.readline()
        assert banner.strip() == (
            "%%MatrixMarket matrix coordinate integer general"
        )
    # values: re-read with numpy and compare against the library
    a = read_pattern(mtx)
    from binary_spgemm_tpu import spgemm_counts

    c, counts = spgemm_counts(a, a)
    body = np.loadtxt(out, comments="%", skiprows=1, ndmin=2, dtype=np.int64)
    assert body.shape == (c.nnz + 1, 3)  # size line + entries
    np.testing.assert_array_equal(np.sort(body[1:, 2]), np.sort(counts))
    # support reads back through the pattern reader (values skipped)
    sup = read_pattern(out, transpose=False)
    assert sup.equals(c)


def test_multiply_counts_rejects_fuse_or(mtx, tmp_path):
    assert (
        main(["multiply", mtx, "--counts", "--fuse-or", mtx]) == 2
    )


def test_graph_clustering_command(tmp_path, capsys):
    import numpy as np

    from binary_spgemm_tpu import write_pattern as wp
    from binary_spgemm_tpu.ops.graph import clustering_coefficients

    # symmetric hollow graph fixture
    a = BCSR.random(80, 80, 3.0, seed=4)
    sp = a.to_scipy()
    sp = ((sp + sp.T) > 0).astype(np.int64).tolil()
    sp.setdiag(0)
    g = BCSR.from_scipy(sp.tocsr())
    p = str(tmp_path / "g.mtx")
    wp(p, g)
    out = str(tmp_path / "cc.csv")
    assert main(["graph", p, "clustering", "--out", out]) == 0
    msg = capsys.readouterr().out
    assert "clustering: n=80" in msg
    got = np.loadtxt(out, delimiter=",")
    np.testing.assert_allclose(got, clustering_coefficients(g), rtol=1e-5)
