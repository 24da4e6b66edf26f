"""Host-side probe: how much of the batched stream's padding could a better
row->bin deal recover?

The 2-D stream's padding (mid-256k ~2.0x useful slots) is per-GROUP
max-over-bins concentration: sort_pad = sum_g pad_bucket(max_bin count_g) * w_g,
while the unreachable ideal is sum_g mean_bin(count_g) * w_g.  The snake deal
orders rows by (dominant class, -row flops) — dominant classes balance well,
minor classes spread binomially.  This probe measures, per canonical config:

  - realized slots under the production snake order,
  - slots under a full class-PROFILE lexicographic snake (rows sorted by
    their whole per-group count vector, so adjacent snake windows are
    homogeneous in every group, not just the dominant one),
  - slots under a profile+greedy rebalance (move rows out of argmax bins),
  - the per-bin mean lower bound.

Pure host numpy — no device work.  Appends ab="deal-padding" rows.
Run: python benchmarks/deal_padding_probe.py [--config mid-256k-d16]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from binary_spgemm_tpu import BCSR
from binary_spgemm_tpu.ops.ell import _batched_deal_plan
from binary_spgemm_tpu.ops.spgemm import pad_bucket, row_flops
from _provenance import emit

CONFIGS = {
    "mid-64k-d16": dict(n=1 << 16, d=16.0, seed=7),
    "mid-256k-d16": dict(n=1 << 18, d=16.0, seed=7),
    "large-1m-d8": dict(n=1 << 20, d=8.0, seed=7),
    "hypersparse-5m-d2": dict(n=5_000_000, d=2.0, seed=7),
}


def slots_for(assign, k, ent_group, ent_row, widths):
    """Realized padded slots of an assignment: per-group pad_bucket(max_bin)
    times group width (the executor's sort_pad formula, ex rows_pad/fill)."""
    G = len(widths)
    cnt = np.bincount(
        ent_group.astype(np.int64) * k + assign[ent_row], minlength=G * k
    ).reshape(G, k)
    tot = 0
    for g in range(G):
        tot += pad_bucket(max(int(cnt[g].max()), 8), div=32) * widths[g]
    return tot, cnt


def mean_bound(ent_group, k, widths):
    G = len(widths)
    per_g = np.bincount(ent_group, minlength=G)
    return sum(
        pad_bucket(max(int(np.ceil(per_g[g] / k)), 8), div=32) * widths[g]
        for g in range(G)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    args = ap.parse_args()
    names = [args.config] if args.config else list(CONFIGS)
    for name in names:
        cfg = CONFIGS[name]
        a = BCSR.random(cfg["n"], cfg["n"], cfg["d"], seed=cfg["seed"])
        rf = row_flops(a, a)
        shift = int(a.n_cols).bit_length()
        cap = 1 << max(0, 30 - shift)
        planned = _batched_deal_plan(
            a, a, rf, cap, None, a.n_cols
        )
        (ell, rows_pc, pos_pc, assign, k, pads, slots, rows_pad,
         _rank) = planned
        widths = list(ell.widths)
        G = len(widths)
        # per-entry (group, row): the group of an A entry is the merged
        # width class of its B row
        rr = np.repeat(
            np.arange(a.n_rows, dtype=np.int64), np.diff(a.indptr)
        )
        ecls = ell.class_of_row[a.indices]
        live = ecls >= 0
        ent_group = ecls[live].astype(np.int64)
        ent_row = rr[live]
        s_snake, cnt = slots_for(assign, k, ent_group, ent_row, widths)
        bound = mean_bound(ent_group, k, widths)

        # (b) full-profile lexicographic snake
        prof = np.zeros((a.n_rows, G), np.int64)
        np.add.at(prof, (ent_row, ent_group), 1)
        order = np.lexsort(tuple(prof[:, g] for g in range(G)))
        pos = np.empty(a.n_rows, np.int64)
        pos[order] = np.arange(a.n_rows)
        lane = (pos % k).astype(np.int32)
        fwd = (pos // k) % 2 == 0
        asg_prof = np.where(fwd, lane, k - 1 - lane).astype(np.int32)
        s_prof, _ = slots_for(asg_prof, k, ent_group, ent_row, widths)

        rec = {
            "ab": "deal-padding", "config": name, "k": k,
            "groups": G, "widths": widths,
            "slots_snake": int(s_snake),
            "slots_profile_snake": int(s_prof),
            "slots_mean_bound": int(bound),
            "pad_over_bound_snake": round(s_snake / bound, 3),
            "pad_over_bound_profile": round(s_prof / bound, 3),
            "bit_exact": "n/a",
        }
        emit(rec)
        print(rec)


if __name__ == "__main__":
    main()
