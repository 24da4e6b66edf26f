"""Prototype: line-blocked ELL engine — thousands of tiny row chunks sorted
as ONE batched minor-axis sort.

Motivation (micro.jsonl, E=2^26): XLA's minor-axis sort on [N, W] runs at
0.44-0.71 ns/elem for W in 128..4096 vs 1.78-2.71 ns/elem for flat rank-1
sorts — ~4x.  sort_compress does TWO sorts per multiply (~70% of runtime),
so a layout whose chunks are lines of a 2-D matrix could nearly halve the
multiply, IF the per-line class padding doesn't eat the gain.  This script
measures exactly that on real inputs.

Usage: python benchmarks/proto_lines.py [--check-cpu]
"""
import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_line_plan(a, ell, k, min_pad):
    """Snake-deal rows into k bins by descending padded weight; per-class
    entry arrays [k, pad_c].  Returns device-ready numpy operands."""
    from binary_spgemm_tpu.ops.ell import _build_class_entries
    from binary_spgemm_tpu.ops.spgemm import pad_bucket

    n = a.n_rows
    widths = list(ell.widths)
    padded_w = np.array(widths + [0], np.int64)
    rfp = np.zeros(n, np.int64)
    if a.nnz:
        entry_w = padded_w[ell.class_of_row[a.indices]]
        cum = np.zeros(a.nnz + 1, np.int64)
        np.cumsum(entry_w, out=cum[1:])
        rfp = cum[a.indptr[1:]] - cum[a.indptr[:-1]]
    order = np.argsort(-rfp, kind="stable")
    pos = np.arange(n)
    lane = (pos % k).astype(np.int32)
    assign = np.empty(n, np.int32)
    assign[order] = np.where((pos // k) % 2 == 0, lane, k - 1 - lane)

    rows_pc, pos_pc = _build_class_entries(a, ell)
    pads = []
    ers, eps = [], []
    for rcls, pcls in zip(rows_pc, pos_pc):
        ch = assign[rcls]
        cnt = np.bincount(ch, minlength=k)
        pad = pad_bucket(int(cnt.max()) if len(rcls) else 1, minimum=min_pad)
        pads.append(pad)
        ordc = np.argsort(ch, kind="stable")
        starts = np.concatenate([[0], np.cumsum(cnt)])
        er = np.full((k, pad), -1, np.int32)  # filled with local ids below
        ep = np.zeros((k, pad), np.int32)
        cell_pos = np.arange(len(rcls)) - np.repeat(starts[:-1], cnt)
        er[ch[ordc], cell_pos] = rcls[ordc]  # global rows for now
        ep[ch[ordc], cell_pos] = pcls[ordc]
        ers.append(er)
        eps.append(ep)

    # chunk-local row ids (ascending global row within bin)
    order2 = np.argsort(assign, kind="stable")
    binsz = np.bincount(assign, minlength=k)
    starts = np.concatenate([[0], np.cumsum(binsz)])
    row_sets = [order2[starts[i] : starts[i + 1]] for i in range(k)]
    local_id = np.empty(n, np.int64)
    local_id[order2] = np.arange(n) - np.repeat(starts[:-1], binsz)
    rows_pad = pad_bucket(int(binsz.max()) or 1, minimum=1)
    for er in ers:
        g = er >= 0
        er[g] = local_id[er[g]]
        er[~g] = rows_pad
    L = sum(p * w for p, w in zip(pads, widths))
    return ers, eps, tuple(pads), rows_pad, L, row_sets


@functools.partial(
    __import__("jax").jit,
    static_argnames=("rows_pad", "n_cols", "widths", "pads", "sort_pad"),
)
def lines_spgemm_jit(
    tables, entry_rows, entry_pos, *, rows_pad, n_cols, widths, pads, sort_pad
):
    import jax
    import jax.numpy as jnp

    INT = jnp.int32
    shift = int(n_cols).bit_length()
    sent = jnp.iinfo(jnp.int32).max
    k = entry_rows[0].shape[0]
    parts = []
    for t, er, ep in zip(tables, entry_rows, entry_pos):
        cols = t[ep]  # [k, pad_c, w] row-gather
        rows = er[:, :, None]
        valid = (cols < n_cols) & (rows < rows_pad)
        key = jnp.where(valid, (rows << shift) | cols, sent)
        parts.append(key.reshape(k, -1))
    fill = sort_pad - sum(p.shape[1] for p in parts)
    if fill:
        parts.append(jnp.full((k, fill), sent, INT))
    keys = jnp.concatenate(parts, axis=1)  # [k, L]
    keys_s = jax.lax.sort((keys,), dimension=1, is_stable=False)[0]
    prev = jnp.concatenate(
        [jnp.full((k, 1), -1, INT), keys_s[:, :-1]], axis=1
    )
    keep = (keys_s != prev) & (keys_s < (rows_pad << shift))
    nnz = jnp.sum(keep, axis=1, dtype=INT)
    demoted = jnp.where(keep, keys_s, sent)
    ck = jax.lax.sort((demoted,), dimension=1, is_stable=False)[0]
    idx = ck & ((1 << shift) - 1)
    rows_ck = jnp.minimum(
        jax.lax.shift_right_logical(ck, shift), rows_pad
    )
    lin = (
        jnp.arange(k, dtype=INT)[:, None] * (rows_pad + 2) + rows_ck + 1
    )
    counts = (
        jnp.zeros(k * (rows_pad + 2), INT).at[lin.reshape(-1)].add(1)
    )
    ptr = jnp.cumsum(
        counts.reshape(k, rows_pad + 2)[:, : rows_pad + 1], axis=1, dtype=INT
    )
    return ptr, idx, nnz


def run_lines(a, b, k, min_pad=8):
    import jax.numpy as jnp

    from binary_spgemm_tpu.ops.ell import EllB, _stitch_sets

    ell = EllB.build(b)
    ers, eps, pads, rows_pad, L, row_sets = build_line_plan(
        a, ell, k, min_pad
    )
    from binary_spgemm_tpu.ops.spgemm import pad_bucket

    sort_pad = pad_bucket(max(L, 8), minimum=8)
    tables = tuple(jnp.asarray(t) for t in ell.tables)
    ers_d = tuple(jnp.asarray(e) for e in ers)
    eps_d = tuple(jnp.asarray(e) for e in eps)

    def run():
        return lines_spgemm_jit(
            tables, ers_d, eps_d,
            rows_pad=rows_pad, n_cols=b.n_cols,
            widths=tuple(ell.widths), pads=pads, sort_pad=sort_pad,
        )

    out = run()
    np.asarray(out[2][:1])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = run()
        np.asarray(out[2][:1])
        ts.append(time.perf_counter() - t0)
    ptr, idx, nnz = (np.asarray(o) for o in out)
    parts = [(ptr[i], idx[i], nnz[i]) for i in range(k)]
    c = _stitch_sets(row_sets, a.n_rows, (a.n_rows, b.n_cols), parts)
    return c, min(ts), k * sort_pad, sort_pad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-cpu", action="store_true")
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--d", type=float, default=16.0)
    ap.add_argument("--rmat", type=int, default=0)
    ap.add_argument("--ks", default="2048,4096,8192,16384")
    ap.add_argument("--min-pad", type=int, default=8)
    args = ap.parse_args()

    import jax

    if args.check_cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from binary_spgemm_tpu import BCSR
    from binary_spgemm_tpu.utils.oracle import spgemm_oracle

    if args.check_cpu:
        a = BCSR.random(3000, 3000, 4.0, seed=1)
        ref = spgemm_oracle(a, a)
        for k in (16, 64, 256):
            c, t, slots, L = run_lines(a, a, k)
            assert c.equals(ref), f"MISMATCH k={k}"
            print(f"k={k}: bit-exact, L={L}")
        a = BCSR.rmat(9, 4.0, seed=2)
        ref = spgemm_oracle(a, a)
        c, t, slots, L = run_lines(a, a, 64)
        assert c.equals(ref), "MISMATCH rmat"
        print("rmat bit-exact")
        return

    if args.rmat:
        a = BCSR.rmat(args.rmat, 8.0, seed=1)
        name = f"rmat-s{args.rmat}"
    else:
        a = BCSR.random(args.n, args.n, args.d, seed=5)
        name = f"n{args.n}-d{args.d}"
    ref = None
    for k in (int(x) for x in args.ks.split(",")):
        c, t, slots, L = run_lines(a, a, k, args.min_pad)
        if ref is None:
            ref = spgemm_oracle(a, a)
        ok = c.equals(ref)
        rec = {
            "bench": "proto_lines", "input": name, "k": k, "line_slots": L,
            "total_slots": slots, "fastest_s": round(t, 5), "bit_exact": ok,
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
