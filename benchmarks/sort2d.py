"""Micro: is a batched 2-D sort (chunks as rows, axis=-1) cheaper than one
long 1-D sort?  Bitonic work/elem scales with log^2(row length), so [k, L]
with small L should beat 1-D k*L; also short rows keep packed int32 keys
viable at any matrix size.  Appends to benchmarks/micro.jsonl."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

dev = jax.devices()[0]
print("device:", dev, flush=True)
rng = np.random.default_rng(0)

def bench(fn, args, n=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[:4]  # force real sync
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:4])
        ts.append(time.perf_counter() - t0)
    return min(ts)

@jax.jit
def sort1(x):
    return jax.lax.sort((x,), is_stable=False)[0]

@jax.jit
def sort2key(r, c):
    return jax.lax.sort((r, c), num_keys=2, is_stable=False)

results = []
TOTAL = 1 << 25  # 33.5M elems
shapes = [(1, TOTAL), (32, TOTAL // 32), (1024, TOTAL // 1024), (8192, TOTAL // 8192)]
for k, L in shapes:
    x = jnp.asarray(rng.integers(0, 1 << 30, size=(k, L), dtype=np.int32))
    x1 = x if k > 1 else x.reshape(-1)
    t = bench(sort1, (x1,))
    rec = {"bench": "sort2d", "kind": "1key", "k": k, "L": L,
           "ns_per_elem": t * 1e9 / TOTAL, "s": t}
    print(json.dumps(rec), flush=True)
    results.append(rec)
# 2-key at the interesting shapes
for k, L in [(1, TOTAL), (1024, TOTAL // 1024)]:
    r = jnp.asarray(rng.integers(0, 1 << 20, size=(k, L), dtype=np.int32))
    c = jnp.asarray(rng.integers(0, 1 << 23, size=(k, L), dtype=np.int32))
    if k == 1:
        r, c = r.reshape(-1), c.reshape(-1)
    t = bench(sort2key, (r, c))
    rec = {"bench": "sort2d", "kind": "2key", "k": k, "L": L,
           "ns_per_elem": t * 1e9 / TOTAL, "s": t}
    print(json.dumps(rec), flush=True)
    results.append(rec)
with open("/root/repo/benchmarks/micro.jsonl", "a") as f:
    for rec in results:
        f.write(json.dumps(rec) + "\n")
