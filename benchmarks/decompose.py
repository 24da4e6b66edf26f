"""Decompose the ELL engine's headline time into pipeline stages.

Runs cumulative variants of the per-chunk pipeline (expansion → sort →
dedup flags → compaction re-sort → indptr) on the real staged operands of
the headline config, timing each.  Differences bound what an epilogue
optimisation could save.  Appends JSON lines to results.jsonl.
"""
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor, _chunk_pair_streams
from binary_spgemm_tpu.ops.spgemm import (
    INT,
    _histogram_indptr_wins,
    _indptr_from_sorted_rows,
    packable,
)

N, D = 1 << 16, 16.0


def make_variant(stage):
    @functools.partial(
        jax.jit,
        static_argnames=(
            "n_chunks", "rows_pad", "n_cols", "widths", "pads", "sort_pad"
        ),
    )
    def fn(tables, er, ep, *, n_chunks, rows_pad, n_cols, widths, pads, sort_pad):
        outs = []
        shift = int(n_cols).bit_length()
        assert packable(rows_pad, n_cols)
        for row, col in _chunk_pair_streams(
            tables, er, ep, n_chunks=n_chunks, rows_pad=rows_pad, n_cols=n_cols,
            widths=widths, pads=pads, sort_pad=sort_pad,
        ):
            key = (row << shift) | col
            if stage == "expand":
                outs.append(jnp.sum(key, dtype=INT))
                continue
            key_s = jax.lax.sort((key,), is_stable=False)[0]
            if stage == "sort1":
                outs.append(key_s[::65536].sum(dtype=INT))
                continue
            prev = jnp.concatenate([jnp.full((1,), -1, INT), key_s[:-1]])
            keep = (key_s != prev) & (key_s < (rows_pad << shift))
            nnz_c = jnp.sum(keep, dtype=INT)
            if stage == "dedup":
                outs.append(nnz_c)
                continue
            demoted = jnp.where(keep, key_s, jnp.iinfo(jnp.int32).max)
            c_keys = jax.lax.sort((demoted,), is_stable=False)[0]
            if stage == "sort2":
                outs.append(c_keys[::65536].sum(dtype=INT) + nnz_c)
                continue
            if _histogram_indptr_wins(rows_pad, key.shape[0]):
                ptr = _indptr_from_sorted_rows(
                    jax.lax.shift_right_logical(c_keys, shift), rows_pad
                )
            else:
                ptr = jnp.searchsorted(
                    c_keys, jnp.arange(rows_pad + 1, dtype=INT) << shift,
                    side="left",
                ).astype(INT)
            outs.append(ptr[-1] + nnz_c + c_keys[::65536].sum(dtype=INT))
        return jnp.stack(outs).sum()

    return fn


def main():
    a = BCSR.random(N, N, D, seed=2026)
    ex = EllSpGEMMExecutor(a, a)
    print(
        f"plan: chunks={ex.n_chunks} rows_pad={ex.rows_pad} "
        f"sort_pad={ex.sort_pad} groups={ex.n_groups}", file=sys.stderr,
    )
    assert ex.n_groups == 1
    er_g, ep_g = next(iter(ex._groups()))
    for stage in ("expand", "sort1", "dedup", "sort2", "full"):
        fn = make_variant(stage)

        def run():
            return fn(
                ex.tables, er_g, ep_g, n_chunks=ex.group_size,
                rows_pad=ex.rows_pad, n_cols=ex.n_cols,
                widths=ex.widths, pads=ex.pads, sort_pad=ex.sort_pad,
            )

        out = run()
        np.asarray(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = run()
            np.asarray(out)
            ts.append(time.perf_counter() - t0)
        rec = {
            "bench": "decompose", "stage": stage,
            "fastest_s": round(min(ts), 5),
            "total_slots": ex.total_slots,
            # stage probes time TRUNCATED kernels — no comparable output
            "bit_exact": "n/a",
        }
        from _provenance import emit
        emit(rec)


if __name__ == "__main__":
    main()
