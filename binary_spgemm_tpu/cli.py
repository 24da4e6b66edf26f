"""Benchmark / validation / data-generation CLI.

Re-creates the reference's command-line surface TPU-natively:

* ``bench``   ≡ ``SpGEMM_mpi_omp path tBlock threads times`` (final/SpGEMM_mpi_omp.c:294-366):
  times C = A·A over repeats and prints the reference's CSV line
  ``tasks,threads,total_cpus,blocksize,path,n,input_nnz,output_nnz,mean,median,fastest``
  (README.md:19-21) — plus an extended JSON record with throughput fields.
* ``validate`` ≡ ``SpGEMM_mpi_omp_validity`` (make test): runs the multi-device
  path and a serial recompute, compares bit-exactly, prints the confirm message.
* ``gen``      ≡ ``Matlab/write_spm.m``: writes a random pattern ``.mtx``.

Mapping of the reference's knobs: MPI ``tasks`` → mesh devices; OpenMP
``threads`` → 1 (XLA owns intra-chip parallelism); ``tBlock`` (rows per slice)
→ ``--chunk-flops`` (flop-balanced slices; ``--blocksize`` reports the derived
mean rows per chunk for CSV compatibility).
"""
from __future__ import annotations

import argparse
import json
import sys

from .formats.bcsr import BCSR
from .io.mmio import read_pattern, write_pattern
from .ops.spgemm import DEFAULT_CHUNK_FLOPS, spgemm, spgemm_flops
from .utils.timers import bench_fn


def _load(path: str, transpose: bool) -> BCSR:
    return read_pattern(path, transpose=transpose)


def _block_until_ready():
    import jax

    (jax.device_put(0.0) + 0).block_until_ready()


def _single_device_spgemm(a, args, b=None):
    b = a if b is None else b
    if args.engine == "ell":
        from .ops.ell import ell_spgemm

        return ell_spgemm(a, b)
    if args.engine == "esc":
        return spgemm(a, b, chunk_flops=args.chunk_flops or DEFAULT_CHUNK_FLOPS)
    return spgemm(a, b, chunk_flops=args.chunk_flops)


def cmd_bench(args) -> int:
    if getattr(args, "sweep", None):
        for value in args.sweep.split(","):
            sub_args = argparse.Namespace(**vars(args))
            sub_args.sweep = None
            sub_args.chunk_flops = int(value)
            rc = cmd_bench(sub_args)
            if rc:
                return rc
        return 0

    import jax

    a = _load(args.path, args.transpose)
    if a.n_rows != a.n_cols:
        print("bench computes C = A*A; matrix must be square", file=sys.stderr)
        return 2

    if getattr(args, "scaling_report", False):
        from .parallel.scaling import format_scaling_report, scaling_report

        counts = None
        if args.devices:
            counts = [d for d in (1, 2, 4, 8, 16, 32) if d < args.devices]
            counts.append(args.devices)
        eng = args.engine if args.engine in ("esc", "ell") else "esc"
        rep = scaling_report(a, device_counts=counts, balance=args.balance,
                             times=args.times, engine=eng,
                             b_layout=args.b_layout)
        if args.json:
            print(json.dumps(rep))
        else:
            print(format_scaling_report(rep))
        return 0

    n_devices = args.devices or 1
    if n_devices > 1:
        from .parallel.dist_spgemm import dist_spgemm
        from .parallel.mesh import make_row_mesh

        mesh = make_row_mesh(n_devices)

        def run():
            return dist_spgemm(
                a, a, mesh, balance=args.balance, b_layout=args.b_layout,
                engine=args.engine,
            )

    elif getattr(args, "tune", False):
        # empirical bin-count refinement: measure the model's plausible-best
        # batched plans once, keep the fastest (ops/ell.py::tuned_executor)
        from .ops.ell import tuned_executor

        ex = tuned_executor(a, a)
        if getattr(ex, "tune_report", None):
            print(
                "tuned: k=%d  %s"
                % (
                    ex.n_chunks,
                    " ".join(f"{k}:{t:.4f}s" for t, k in ex.tune_report),
                ),
                file=sys.stderr,
            )

        def run():
            return ex.assemble(ex.run())

    else:

        def run():
            return _single_device_spgemm(a, args)

    c = run()  # warmup: compiles every shape bucket
    _block_until_ready()
    stats = bench_fn(lambda: run(), repeats=args.times, barrier=_block_until_ready)

    blocksize = (
        (args.chunk_flops or 0) if n_devices == 1 else a.n_rows // n_devices
    )  # 0 = auto engine (no fixed chunk size)
    csv = (
        f"{n_devices},1,{n_devices},{blocksize},{args.path},{a.n_rows},"
        f"{a.nnz},{c.nnz},{stats.mean:.6f},{stats.median:.6f},{stats.fastest:.6f}"
    )
    print(csv)
    if args.json:
        flops = spgemm_flops(a, a)
        print(
            json.dumps(
                {
                    "devices": n_devices,
                    "platform": jax.devices()[0].platform,
                    "path": args.path,
                    "n": a.n_rows,
                    "input_nnz": a.nnz,
                    "output_nnz": c.nnz,
                    "flops": flops,
                    "mean_s": stats.mean,
                    "median_s": stats.median,
                    "fastest_s": stats.fastest,
                    "output_nnz_per_s": c.nnz / stats.fastest,
                    "flops_per_s": flops / stats.fastest,
                }
            )
        )
    return 0


def cmd_validate(args) -> int:
    a = _load(args.path, args.transpose)
    from .parallel.dist_spgemm import dist_spgemm
    from .parallel.mesh import make_row_mesh
    from .utils.oracle import spgemm_oracle

    mesh = make_row_mesh(args.devices) if args.devices else make_row_mesh()
    c_par = dist_spgemm(
        a, a, mesh, balance=args.balance, b_layout=args.b_layout
    )
    c_ser = _single_device_spgemm(a, args)
    ok = c_par.equals(c_ser)
    oracle_ok = True
    if args.oracle:
        oracle_ok = c_ser.equals(spgemm_oracle(a, a))
    if ok and oracle_ok:
        # ≡ final/SpGEMM_mpi_omp_validity.c:340
        print("Results of serial and multicore are the same!")
        return 0
    if not ok:
        print("MISMATCH between serial and multi-device results", file=sys.stderr)
        print(c_par.diff(c_ser), file=sys.stderr)
    if not oracle_ok:
        print("MISMATCH vs scipy oracle", file=sys.stderr)
        print(c_ser.diff(spgemm_oracle(a, a)), file=sys.stderr)
    return 1


def cmd_gen(args) -> int:
    if args.rmat:
        scale = args.n.bit_length() - 1
        if (1 << scale) != args.n:
            raise SystemExit("--rmat requires n to be a power of two")
        mat = BCSR.rmat(scale, args.d, seed=args.seed)
        comment = f"rmat pattern n={args.n} edge_factor={args.d} seed={args.seed}"
    else:
        mat = BCSR.random(args.n, args.n, args.d, seed=args.seed)
        comment = f"random pattern n={args.n} d={args.d} seed={args.seed}"
    write_pattern(args.out, mat, comment=comment)
    print(f"wrote {args.out}: n={args.n} nnz={mat.nnz}")
    return 0


def cmd_multiply(args) -> int:
    """Compute one op — C = A·B, F.*(A·B), D OR (A·B), or D OR (F.*(A·B)) —
    and optionally write the result as a pattern ``.mtx`` (the capability the
    reference's CLI lacked: its binaries only ever timed C = A·A)."""
    a = _load(args.path, args.transpose)
    b = _load(args.b, args.transpose) if args.b else a
    kw = {"chunk_flops": args.chunk_flops}
    if args.engine == "esc" and kw["chunk_flops"] is None:
        kw["chunk_flops"] = DEFAULT_CHUNK_FLOPS
    mask = _load(args.mask, args.transpose) if args.mask else None
    if getattr(args, "counts", False):
        if args.fuse_or:
            print("--counts cannot combine with --fuse-or", file=sys.stderr)
            return 2
        from .ops.counts import masked_spgemm_counts, spgemm_counts

        # --engine esc was already lowered to a forced chunk_flops above;
        # pass "ell" through so spgemm_counts forces-or-raises like the
        # dist counts ops (a plain "ell" choice used to be silently ignored)
        ckw = dict(kw, engine="ell") if args.engine == "ell" else kw
        if mask is not None:
            c, counts = masked_spgemm_counts(mask, a, b, **ckw)
        else:
            c, counts = spgemm_counts(a, b, **ckw)
        if args.out:
            from .io.mmio import write_integer

            write_integer(
                args.out, c, counts,
                comment=f"integer product from {args.path}"
                + (f" * {args.b}" if args.b else " squared"),
            )
        total = int(counts.sum()) if counts.size else 0
        print(
            f"C: shape={c.shape} nnz={c.nnz} sum(counts)={total}"
            + (f" -> {args.out}" if args.out else "")
        )
        return 0
    if args.fuse_or:
        from .ops.fused import spgemm_or

        d = _load(args.fuse_or, args.transpose)
        c = spgemm_or(d, a, b, mask=mask, **kw)
    elif mask is not None:
        from .ops.masked import masked_spgemm

        c = masked_spgemm(mask, a, b, **kw)
    else:
        c = _single_device_spgemm(a, args, b)
    if args.out:
        write_pattern(
            args.out, c,
            comment=f"C from {args.path}"
            + (f" * {args.b}" if args.b else " squared"),
        )
    print(f"C: shape={c.shape} nnz={c.nnz}" + (f" -> {args.out}" if args.out else ""))
    return 0


def cmd_graph(args) -> int:
    """Graph ops over the SpGEMM core: reachability closure, k-hop,
    triangle-edge structure."""
    from .ops.graph import bfs_levels, k_hop, transitive_closure, triangle_structure

    if args.op in ("triangles", "bfs", "ktruss", "clustering") and args.device:
        print(f"{args.op} has no device-resident form", file=sys.stderr)
        return 2
    a = _load(args.path, args.transpose)
    if args.op == "bfs":
        if not args.sources:
            print("bfs needs --sources", file=sys.stderr)
            return 2
        try:
            sources = [int(s) for s in args.sources.split(",")]
        except ValueError:
            print(
                f"--sources must be comma-separated integers, got "
                f"{args.sources!r}",
                file=sys.stderr,
            )
            return 2
        lv = bfs_levels(
            a, sources, max_hops=args.max_iters, chunk_flops=args.chunk_flops
        )
        n_reach = int((lv >= 0).sum())
        print(f"bfs: n={a.n_rows} reachable={n_reach} max_level={int(lv.max())}")
        csv = ",".join(str(int(x)) for x in lv)
        if args.out:
            with open(args.out, "w") as fh:
                fh.write(csv + "\n")
            print(f"levels -> {args.out}")
        else:
            print(csv)
        return 0
    if args.op == "clustering":
        from .ops.graph import clustering_coefficients

        cc = clustering_coefficients(a, chunk_flops=args.chunk_flops)
        csv = ",".join(f"{x:.6g}" for x in cc)
        print(
            f"clustering: n={a.n_rows} mean={float(cc.mean()):.6g} "
            f"max={float(cc.max()):.6g}"
        )
        if args.out:
            with open(args.out, "w") as fh:
                fh.write(csv + "\n")
            print(f"coefficients -> {args.out}")
        else:
            print(csv)
        return 0
    if args.op == "closure":
        c = transitive_closure(
            a, max_iters=args.max_iters, chunk_flops=args.chunk_flops,
            device=args.device, one_sort=not args.two_sort,
        )
    elif args.op == "khop":
        c = k_hop(
            a, args.k, chunk_flops=args.chunk_flops, device=args.device,
            one_sort=not args.two_sort,
        )
    elif args.op == "ktruss":
        from .ops.graph import k_truss

        if args.k < 3:
            print("ktruss needs --k >= 3", file=sys.stderr)
            return 2
        c = k_truss(a, args.k, chunk_flops=args.chunk_flops)
    else:  # triangles
        if args.count:
            from .ops.graph import triangle_count

            t = triangle_count(a, chunk_flops=args.chunk_flops)
            print(f"triangles: n={a.n_rows} count={t}")
            return 0
        c = triangle_structure(a, chunk_flops=args.chunk_flops)
    if args.out:
        write_pattern(args.out, c, comment=f"{args.op} of {args.path}")
    print(
        f"{args.op}: shape={c.shape} nnz={c.nnz}"
        + (f" -> {args.out}" if args.out else "")
    )
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="binary_spgemm_tpu",
        description="TPU-native boolean SpGEMM benchmark/validation CLI",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    # io_common: flags every command honours; common adds the engine and
    # mesh knobs only bench/validate wire through (multiply/graph must not
    # silently accept-and-ignore --devices/--balance/--b-layout)
    io_common = argparse.ArgumentParser(add_help=False)
    io_common.add_argument("path", help="Matrix-Market pattern file")
    io_common.add_argument(
        "--no-transpose",
        dest="transpose",
        action="store_false",
        help="read the file as-is instead of the reference's transpose semantics",
    )
    io_common.add_argument(
        "--chunk-flops",
        type=int,
        default=None,
        help="max Gustavson flops per ESC row chunk (≈ tBlock); setting it "
        "forces the ESC engine (default: auto engine, sliced-ELL when it fits)",
    )
    engine_common = argparse.ArgumentParser(add_help=False)
    engine_common.add_argument(
        "--engine",
        choices=["auto", "esc", "ell"],
        default="auto",
        help="SpGEMM engine (auto = sliced-ELL when its expansion fits)",
    )
    common = argparse.ArgumentParser(
        add_help=False, parents=[io_common, engine_common]
    )
    common.add_argument(
        "--devices", type=int, default=None, help="mesh size (≈ MPI tasks)"
    )
    common.add_argument(
        "--balance",
        choices=["flops", "rows"],
        default="flops",
        help="row partition strategy (rows = reference parity)",
    )
    common.add_argument(
        "--b-layout",
        choices=["replicated", "sharded", "ring"],
        default="replicated",
        help="B operand layout on the mesh (replicated = reference parity; "
        "sharded = in-SPMD all-gather; ring = ppermute pipeline, O(nnz/S) mem)",
    )

    b = sub.add_parser("bench", parents=[common], help="time C = A*A")
    b.add_argument("--times", type=int, default=5, help="repeat count")
    b.add_argument("--json", action="store_true", help="also print a JSON record")
    b.add_argument(
        "--tune",
        action="store_true",
        help="measure the model's plausible-best batched bin counts once and "
        "bench the fastest (staged; one compile per candidate)",
    )
    b.add_argument(
        "--scaling-report",
        action="store_true",
        help="measure the SPMD step at 1..N devices (N = --devices or all), "
        "separating per-shard compute from collective time; prints the "
        ">=80%%-efficiency report (BASELINE config 5)",
    )
    b.add_argument(
        "--sweep",
        default=None,
        help="comma-separated chunk-flops values to sweep (one CSV line each; "
        "≡ the reference's tBlock blocksize sweep)",
    )
    b.set_defaults(fn=cmd_bench)

    v = sub.add_parser(
        "validate", parents=[common], help="serial vs multi-device bit-exact check"
    )
    v.add_argument(
        "--oracle", action="store_true", help="also compare against scipy"
    )
    v.set_defaults(fn=cmd_validate)

    m = sub.add_parser(
        "multiply",
        parents=[io_common, engine_common],
        help="compute C = A*B (masked / fused-OR variants) and write it",
    )
    m.add_argument("b", nargs="?", default=None, help="B operand (default: A)")
    m.add_argument("--mask", default=None, help="mask F: C = F .* (A*B)")
    m.add_argument(
        "--fuse-or", default=None, help="D operand: C = D OR (F.*?(A*B))"
    )
    m.add_argument("--out", default=None, help="write C as a pattern .mtx")
    m.add_argument(
        "--counts",
        action="store_true",
        help="counting multiply: per-entry multiplicities (the integer "
        "product of 0/1 matrices); --out writes coordinate integer .mtx",
    )
    m.set_defaults(fn=cmd_multiply)

    gr = sub.add_parser(
        "graph",
        parents=[io_common],
        help="closure / k-hop / triangle structure",
    )
    gr.add_argument(
        "op",
        choices=[
            "closure", "khop", "triangles", "bfs", "ktruss", "clustering",
        ],
    )
    gr.add_argument("--k", type=int, default=2, help="k for khop/ktruss")
    gr.add_argument("--max-iters", type=int, default=None)
    gr.add_argument(
        "--sources",
        default=None,
        help="comma-separated source node ids (bfs; levels print as CSV)",
    )
    gr.add_argument(
        "--count",
        action="store_true",
        help="triangles: print the triangle COUNT (device counting kernel, "
        "needs a symmetric hollow adjacency) instead of the edge structure",
    )
    gr.add_argument(
        "--device",
        action="store_true",
        help="HBM-resident iteration (closure/khop): two scalar syncs per round",
    )
    gr.add_argument(
        "--two-sort",
        action="store_true",
        help="with --device: compacted rounds instead of the default "
        "one-sort sentinel-holed streams (ops/onesort.py)",
    )
    gr.add_argument("--out", default=None, help="write the result .mtx")
    gr.set_defaults(fn=cmd_graph)

    g = sub.add_parser("gen", help="generate a random pattern .mtx")
    g.add_argument("out")
    g.add_argument("-n", type=int, required=True, help="matrix dimension")
    g.add_argument("-d", type=float, required=True, help="nnz per row")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument(
        "--rmat",
        action="store_true",
        help="power-law R-MAT graph instead of uniform Bernoulli "
        "(SuiteSparse web/social-graph stand-in; n must be a power of two)",
    )
    g.set_defaults(fn=cmd_gen)
    return p


def main(argv=None) -> int:
    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # honour the env var even though this image's sitecustomize pre-registers
        # the TPU backend (see tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", "cpu")
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
