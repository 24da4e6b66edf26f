"""Micro: class-table row-gather rate vs table width, in the exact shape the
batched expansion uses (gather -> reshape(k, -1), fused by XLA).

The batched planner's DP merge optimises padded SLOTS (sort cost) only; in
the hypersparse regime the expansion gather dominates (sort_small shows
sorts at the dispatch floor for L<=512 while the 133 ms 5M-d2 kernel is
mostly expansion).  Narrow trailing dims tile-pad to 128 lanes, so w=1..4
gathers waste most of each memory transaction — this quantifies the rate
curve so the DP can trade padding (wider merged classes) against gather
efficiency.  Also checks whether ascending (host-presorted) indices help
(answer from the first run: no — 8.84 ns/elem either way at w=1).
Appends to benchmarks/micro.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

dev = jax.devices()[0]
print("device:", dev, flush=True)
rng = np.random.default_rng(0)


def bench(fn, args, n=5):
    out = fn(*args)
    np.asarray(out.ravel()[:4])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out.ravel()[:4])
        ts.append(time.perf_counter() - t0)
    return min(ts)


@jax.jit
def rowgather2d(tbl, pos):
    k = pos.shape[0]
    return tbl[pos].reshape(k, -1)  # the expansion's exact access pattern


results = []
TOTAL = 1 << 26  # gathered slots, above the dispatch floor
NC = 1 << 21     # table rows
K = 1 << 12      # chunks
for w in (1, 2, 4, 8, 16, 32, 128):
    e = TOTAL // w // K
    tbl = jnp.asarray(rng.integers(0, 1 << 22, size=(NC, w), dtype=np.int32))
    pos = jnp.asarray(rng.integers(0, NC, size=(K, e), dtype=np.int32))
    t = bench(rowgather2d, (tbl, pos))
    rec = {
        "bench": "gather_width2", "w": w, "k": K, "e": e,
        "ns_per_elem": t * 1e9 / TOTAL, "s": t,
    }
    print(json.dumps(rec), flush=True)
    results.append(rec)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "micro.jsonl"), "a") as f:
    for rec in results:
        f.write(json.dumps(rec) + "\n")
