"""Micro: 2-D 1-key sort rate vs row length at 2^27 elements (the previous
2^25 runs were dispatch-floor-bound below L=4096).  Feeds the batched
planner's _sort_rate_ns points.  Appends to benchmarks/micro.jsonl."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
def sort1(x):
    return jax.lax.sort(x, dimension=1, is_stable=False)


results = []
TOTAL = 1 << 27
for L in (128, 512, 2048, 8192, 65536):
    k = TOTAL // L
    x = jnp.asarray(rng.integers(0, 1 << 30, size=(k, L), dtype=np.int32))
    t = bench(sort1, (x,))
    rec = {
        "bench": "sort_rate27", "kind": "1key", "k": k, "L": L,
        "ns_per_elem": t * 1e9 / TOTAL, "s": t,
    }
    print(json.dumps(rec), flush=True)
    results.append(rec)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "micro.jsonl"), "a") as f:
    for rec in results:
        f.write(json.dumps(rec) + "\n")
