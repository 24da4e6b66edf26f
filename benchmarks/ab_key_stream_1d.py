"""Same-window A/B: keyed vs pair-stream assembly for the UNROLLED 1-D
engine (the dealt plan power-law inputs run).  The 2-D key-stream win
(ab="key-stream") does not automatically transfer: the unrolled form's
multi-million-slot sorts may fuse the full-stream pack differently.

Run: python benchmarks/ab_key_stream_1d.py [--config rmat-s18-e8]
Appends ab="key-stream-1d" rows.
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops.ell import (
    EllSpGEMMExecutor, _chunk_pair_streams, _unpack_entries, _unpack_tables,
)
from binary_spgemm_tpu.ops.spgemm import INT, sort_compress_seps
from binary_spgemm_tpu.utils.trace import measure_dispatch_floor
from _provenance import emit

CONFIGS = {
    "rmat-s18-e8": dict(kind="rmat", scale=18, d=8.0, seed=7),
    "rmat-s16-e8": dict(kind="rmat", scale=16, d=8.0, seed=7),
}

STATIC = ("table_shapes", "n_chunks", "rows_pad", "n_cols", "widths", "pads",
          "sort_pad", "out_pad")


@functools.partial(jax.jit, static_argnames=STATIC)
def pair_kernel(tables_flat, er_all, ep_all, row0, *, table_shapes,
                n_chunks, rows_pad, n_cols, widths, pads, sort_pad,
                out_pad=None):
    """The pre-key-stream unrolled kernel: pair streams + in-compress pack."""
    tables = _unpack_tables(tables_flat, table_shapes)
    ep_spans = tuple(
        p * w if shape is None else p
        for shape, w, p in zip(table_shapes, widths, pads)
    )
    er, ep = _unpack_entries(er_all, ep_all, row0, n_chunks, pads, ep_spans)
    sep_rows = jnp.arange(rows_pad, dtype=INT)
    sep_cols = jnp.full((rows_pad,), n_cols, INT)
    outs = []
    for row, col in _chunk_pair_streams(
        tables, er, ep, n_chunks=n_chunks, rows_pad=rows_pad,
        n_cols=n_cols, widths=widths, pads=pads,
        sort_pad=sort_pad - rows_pad,
    ):
        outs.append(
            sort_compress_seps(
                jnp.concatenate([row, sep_rows]),
                jnp.concatenate([col, sep_cols]),
                rows_pad, n_cols,
            )
        )
    if out_pad is not None and out_pad < sort_pad:
        outs = [(i[:out_pad], n) for i, n in outs]
    return tuple(jnp.stack([o[i] for o in outs]) for i in range(2))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="rmat-s18-e8")
    ap.add_argument("--times", type=int, default=4)
    args = ap.parse_args()
    cfg = CONFIGS[args.config]
    a = BCSR.rmat(cfg["scale"], cfg["d"], seed=cfg["seed"])
    ex = EllSpGEMMExecutor(a, a)
    assert not ex.batched
    kw = dict(ex._flat_kw())
    kw["out_pad"] = ex.out_pad
    floor = measure_dispatch_floor()

    def run_pair():
        outs = [
            pair_kernel(ex.tables_flat, ex.er_all, ex.ep_all, r0, **kw)
            for r0 in ex._row0s()
        ]
        if len(outs) == 1:
            return outs[0]
        return tuple(
            jnp.concatenate([o[i] for o in outs]) for i in range(2)
        )

    results = {}
    for name, fn in (("pair", run_pair), ("key", ex.run)):
        out = fn()
        np.asarray(out[-1])
        ts = []
        for _ in range(args.times):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out[-1])
            ts.append(time.perf_counter() - t0)
        results[name] = (min(ts), out)
    (tp, out_p), (tk, out_k) = results["pair"], results["key"]
    same = bool(
        np.array_equal(np.asarray(out_p[1]), np.asarray(out_k[1]))
        and np.array_equal(np.asarray(out_p[0]), np.asarray(out_k[0]))
    )
    for variant, t in (("pair-stream", tp), ("key-stream", tk)):
        emit({
            "ab": "key-stream-1d", "config": args.config, "variant": variant,
            "k": ex.n_chunks, "sort_pad": ex.sort_pad,
            "t_device_path_s": round(t, 5),
            "device_s": round(t - floor, 5), "floor_s": round(floor, 6),
            "streams_equal": same, "bit_exact": same,
        })
    print(f"pair {tp:.4f}  key {tk:.4f}  equal={same}", flush=True)


if __name__ == "__main__":
    main()
