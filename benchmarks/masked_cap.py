"""Measure ROADMAP item 6's open question: should ``masked_spgemm`` build its
ELL executor with ``masked=True`` (halved row cap so the (row, col, tag) sort
key stays single-int32 packed) by default at large n?

Compares run_masked fastest-of-N with a pre-staged mask for both executor
variants at n=256K d=16 (the first size where the plans diverge: unmasked
rows_pad 2048 fits the plain key but not the tagged one).

Appends one JSON line per variant to benchmarks/results.jsonl.
"""
import json
import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops.ell import EllSpGEMMExecutor
from binary_spgemm_tpu.ops.spgemm import packable
from binary_spgemm_tpu.utils.oracle import masked_spgemm_oracle

N, D, REPEATS = 262_144, 16.0, 5


def main():
    a = BCSR.random(N, N, D, seed=5)
    f = BCSR.random(N, N, D / 2, seed=8)
    ref = None
    for masked_flag in (False, True):
        ex = EllSpGEMMExecutor(a, a, masked=masked_flag)
        key_cols = 2 * ex.n_cols + 1
        staged = ex.stage_mask(f)
        out = ex.run_masked(staged)
        np.asarray(out[-1][:1])  # force through the tunnel
        ts = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = ex.run_masked(staged)
            np.asarray(out[-1][:1])
            ts.append(time.perf_counter() - t0)
        c = ex.assemble(out)
        if ref is None:
            ref = masked_spgemm_oracle(f, a, a)
        assert c.equals(ref), f"masked={masked_flag} not bit-exact"
        rec = {
            "bench": "masked_cap",
            "n": N,
            "d": D,
            "masked_flag": masked_flag,
            "n_chunks": ex.n_chunks,
            "rows_pad": ex.rows_pad,
            "sort_pad": ex.sort_pad,
            "total_slots": ex.total_slots,
            "packed_tagged_key": packable(ex.rows_pad, key_cols),
            "dealt": ex.row_sets is not None,
            "fastest_s": min(ts),
            "mean_s": sum(ts) / len(ts),
            "nnz": int(c.nnz),
            "bit_exact": True,  # gated by the equals(ref) assert above
        }
        from _provenance import emit

        emit(rec)


if __name__ == "__main__":
    main()
