"""Calibrate the dual-roofline sort-rate table (utils/trace.py) by measurement.

VERDICT r03 weak #2: the old ceiling priced sorts with a quadratic
bitonic-pass pencil model measured only at L<=2^13, and blocked-32k read
fraction_of_dual = 1.26 — above the "ceiling".  This harness measures the
BEST available full-sort rate (XLA ``lax.sort`` vs the Pallas bitonic kernel
where eligible) at every production L bucket, ex-dispatch (the in-run
measured null-kernel floor is subtracted; each shape carries ~2^27 elements
so the floor is <2% of device time), and appends one row per (kernel, L) to
micro.jsonl plus a summary ``sort_rate_table`` row whose ``table`` field is
what utils/trace.py's SORT_RATE_2D_NS / SORT_RATE_FLAT_NS should pin.

Usage: python benchmarks/sort_rate_table.py [--elems 27] [--times 5]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MICRO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "micro.jsonl")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--elems", type=int, default=27, help="log2 total elements per shape")
    ap.add_argument("--times", type=int, default=5)
    ap.add_argument("--only", choices=("all", "2d", "flat"), default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from binary_spgemm_tpu.ops.bitonic import bitonic_sort_rows, eligible
    from binary_spgemm_tpu.utils.trace import measure_dispatch_floor

    dev = jax.devices()[0]
    floor = measure_dispatch_floor()
    print(f"# in-run dispatch floor: {floor * 1e3:.2f} ms", flush=True)
    rng = np.random.default_rng(11)
    E = 1 << args.elems

    def timed(f, x):
        out = f(x)
        np.asarray(out[:1, :4]) if out.ndim == 2 else np.asarray(out[:4])
        ts = []
        for _ in range(args.times):
            t0 = time.perf_counter()
            out = f(x)
            np.asarray(out[:1, :4]) if out.ndim == 2 else np.asarray(out[:4])
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    rows = []
    table_2d: dict[int, float] = {}
    # 2-D row sorts at every production L bucket.  k = E/L keeps every shape
    # at the same element count so floor subtraction is uniform.
    for L in (256, 512, 1024, 2048, 4096, 8192) if args.only != "flat" else ():
        k = E // L
        x = rng.integers(0, 1 << 30, (k, L), dtype=np.int32)
        xd = jnp.asarray(x)
        want = None
        best_rate, best_kernel = float("inf"), None
        variants = [("xla", jax.jit(lambda v: jax.lax.sort(v, dimension=1, is_stable=False)))]
        if eligible(k, L):
            variants.append(("pallas", jax.jit(bitonic_sort_rows)))
        for name, f in variants:
            try:
                t, out = timed(f, xd)
            except Exception as e:  # Mosaic compile rejection etc.
                rows.append({"bench": "sort_rate_table", "kind": "2d",
                             "kernel": name, "k": k, "L": L,
                             "error": f"{type(e).__name__}: {e}"[:200]})
                continue
            if want is None:
                want = np.sort(x, axis=1)
            exact = np.array_equal(np.asarray(out), want)
            rate = max(t - floor, 1e-9) * 1e9 / (k * L)
            rows.append({
                "bench": "sort_rate_table", "kind": "2d", "kernel": name,
                "k": k, "L": L, "fastest_s": round(t, 6),
                "floor_s": round(floor, 6),
                "ns_per_elem_ex_floor": round(rate, 4),
                "bit_exact": bool(exact),
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            })
            print(json.dumps(rows[-1]), flush=True)
            assert exact, (name, k, L)
            if rate < best_rate:
                best_rate, best_kernel = rate, name
        if best_kernel is not None:
            table_2d[L] = round(best_rate, 4)

    # Flat 1-D sorts (the unrolled engine's per-chunk sorts).  A single
    # small flat sort hides entirely under the dispatch floor (L=2^20
    # measured BELOW the floor), so chain R data-dependent sorts inside one
    # program (re-perturb between iterations with a free xor — sort network
    # cost is data-independent) and divide: rate = (t - floor) / (R·L).
    table_flat: dict[int, float] = {}
    for logL in (19, 20, 22, 23, 25) if args.only != "2d" else ():
        L = 1 << logL
        R = max((1 << 27) // L, 1)
        x = rng.integers(0, 1 << 30, (L,), dtype=np.int32)
        xd = jnp.asarray(x)

        def chain(v, R=R):
            return jax.lax.fori_loop(
                0, R,
                lambda i, s: jax.lax.sort(s ^ i, is_stable=False),
                v,
            )

        f = jax.jit(chain)
        t, out = timed(f, xd)
        # correctness: the chain's last iteration sorted (prev ^ (R-1)); we
        # only gate that the output IS ascending (bit-exactness of lax.sort
        # itself is pinned by the 2-D section and the oracle suite)
        o = np.asarray(out)
        exact = bool(np.all(np.diff(o) >= 0))
        rate = max(t - floor, 1e-9) * 1e9 / (R * L)
        rows.append({
            "bench": "sort_rate_table", "kind": "flat", "kernel": "xla",
            "L": L, "chain": R, "fastest_s": round(t, 6),
            "floor_s": round(floor, 6),
            "ns_per_elem_ex_floor": round(rate, 4), "bit_exact": exact,
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        })
        print(json.dumps(rows[-1]), flush=True)
        assert exact, ("flat", L)
        table_flat[L] = round(rate, 4)

    summary = {
        "bench": "sort_rate_table", "kind": "summary",
        "platform": getattr(dev, "device_kind", dev.platform),
        "floor_s": round(floor, 6),
        "elems_per_shape": E,
        "table_2d_ns": table_2d,
        "table_flat_ns": table_flat,
        "bit_exact": True,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    rows.append(summary)
    print(json.dumps(summary), flush=True)
    with open(MICRO, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
