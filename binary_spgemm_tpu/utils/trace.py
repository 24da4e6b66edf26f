"""Profiling & observability.

The reference's entire observability stack is manual ``tic``/``toc`` region
timing (final/utils.h:7-8) plus commented-out per-phase printfs
(old/SpGEMM_omp.c:274,303) and out-of-tree callgrind runs (.gitignore:5).
Here:

* :func:`phase_timer` — named region timing with device sync (tic/toc parity,
  but correct under async dispatch);
* :func:`trace` — a ``jax.profiler`` trace context writing TensorBoard-readable
  traces (the callgrind replacement);
* :func:`roofline` — bytes-moved / speed-of-light estimate for an ESC SpGEMM
  call, used by the benchmark CLI to report % of HBM roofline.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time

import jax

__all__ = ["phase_timer", "trace", "roofline", "bsr_roofline", "PhaseRecord"]


@dataclasses.dataclass
class PhaseRecord:
    name: str
    seconds: float


class phase_timer:
    """Collects named, device-synced phase timings.

    >>> pt = phase_timer()
    >>> with pt("expand"): out = f(x)
    >>> pt.records  # [PhaseRecord("expand", ...)]
    """

    def __init__(self):
        self.records: list[PhaseRecord] = []

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        yield
        # drain the dispatch queue so the phase really finished
        (jax.device_put(0.0) + 0).block_until_ready()
        self.records.append(PhaseRecord(name, time.perf_counter() - t0))

    def report(self) -> str:
        total = sum(r.seconds for r in self.records) or 1.0
        lines = [
            f"{r.name:<24s} {r.seconds * 1e3:9.2f} ms  {r.seconds / total:6.1%}"
            for r in self.records
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """``jax.profiler`` trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# Measured per-call dispatch floor through this environment's remote tunnel
# (~27 ms regardless of work size; see CLAUDE.md and micro.jsonl).
DISPATCH_FLOOR_S = 0.027

# Measured VPU compare-exchange throughput of the best sort kernel on this
# chip (Pallas bitonic, benchmarks/pallas_sort.py): ns per element per
# network pass; a length-L bitonic runs log2(L)·(log2(L)+1)/2 passes.
SORT_NS_PER_ELEM_PASS = 3e-3

# Per-chip HBM bandwidth for roofline estimates (bytes/s).  v5e ≈ 819 GB/s.
HBM_BYTES_PER_S = {
    "tpu v5 lite": 819e9,
    "tpu v4": 1228e9,
    "cpu": 50e9,
}


def roofline(
    flops_pad: int,
    nnz_a: int,
    nnz_c: int,
    seconds: float,
    device=None,
    *,
    sort_len: int | None = None,
) -> dict:
    """Speed-of-light audit of one sort-based SpGEMM call.

    Traffic model (bytes that *must* move through HBM for this algorithm
    class): expansion streams ~3 slot-sized int32 arrays (~12 B/slot); each of
    the two sorts is multi-pass — a merge-style sort of length L reads and
    writes its key array ~log2(L) times (~8·log2(L) B/slot per sort);
    compression streams ~3 more arrays; plus the input/output index arrays.
    ``sort_len`` is the per-sort length (the chunk's padded slot count) —
    defaults to ``flops_pad``.  Deliberately coarse: the point is a stable %
    figure to track between rounds, with the sort's pass count modelled
    honestly instead of pretending a sort is one streaming pass.
    """
    import math

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu").lower()
    bw = next(
        (v for k, v in HBM_BYTES_PER_S.items() if k in kind), 100e9
    )
    L = sort_len if sort_len else max(flops_pad, 2)
    sort_passes = max(math.log2(L), 1.0)
    bytes_moved = int(
        (12 + 2 * 8 * sort_passes + 12) * flops_pad + 4 * (nnz_a + nnz_c)
    )
    sol_s = bytes_moved / bw
    rec = {
        "model": "sort",
        "model_bytes": bytes_moved,
        "speed_of_light_s": sol_s,
        "achieved_s": seconds,
        "fraction_of_roofline": sol_s / seconds if seconds else 0.0,
        "bandwidth_assumed_gbps": bw / 1e9,
    }
    # Dual roofline: the bandwidth model above assumes sorts stream at HBM
    # speed, but a compare-exchange network is COMPUTE-bound on the VPU —
    # the measured floor (Pallas bitonic, results.jsonl ab="pallas-sort":
    # 0.224 ns/elem at L=4096/78 passes, 0.22 at L=2048/66) is
    # ~3e-3 ns/elem/pass.  No sort-based engine can beat
    # max(bandwidth_s, sort_compute_s); report the fraction against that
    # achievable ceiling alongside the legacy bandwidth-only figure.
    # Calibration caveat: the per-pass rate is measured at the batched
    # engine's lengths (L <= 2^13).  At the unrolled engine's multi-
    # million-slot lengths XLA's in-context sorts beat the quadratic-in-
    # log pass model, so fraction_of_dual can exceed 1 there (blocked-32k:
    # 1.25) — read >1 as "at the modeled ceiling", not super-luminal.
    if "tpu" in kind:
        m = math.log2(L)
        net_passes = m * (m + 1) / 2
        sort_compute_s = 2 * flops_pad * SORT_NS_PER_ELEM_PASS * net_passes / 1e9
        dual = max(sol_s, sort_compute_s)
        rec["sort_compute_s"] = sort_compute_s
        rec["fraction_of_dual"] = dual / seconds if seconds else 0.0
    # This environment's remote-dispatch tunnel adds a measured ~27 ms floor
    # to EVERY device call (benchmarks/micro.jsonl "sort_rate27" protocol) —
    # at mid-64k the floor alone is 3.2x the model SOL, capping the raw
    # fraction at ~24% regardless of kernel quality.  Report the
    # floor-adjusted fraction alongside so device-time progress stays
    # visible: fraction_ex_dispatch = SOL / (achieved - floor).  On a
    # PCIe-attached host the two columns converge.
    if "tpu" in kind and seconds > DISPATCH_FLOOR_S:
        rec["dispatch_floor_s"] = DISPATCH_FLOOR_S
        rec["fraction_ex_dispatch"] = sol_s / (seconds - DISPATCH_FLOOR_S)
    return rec


# Per-chip dense peak for the MXU roofline (bf16 multiply, f32 accumulate).
# v5e ≈ 197 TFLOP/s bf16; v4 ≈ 275.
MXU_FLOPS_PER_S = {
    "tpu v5 lite": 197e12,
    "tpu v4": 275e12,
    "cpu": 1e11,
}


def bsr_roofline(
    n_pairs: int,
    n_out_blocks: int,
    block_size: int,
    seconds: float,
    device=None,
) -> dict:
    """Speed-of-light audit of one blocked (MXU) SpGEMM call — the
    dense-tile engine's own model (the sort model above is meaningless for
    it: no sorts run, the cost is tile matmuls + tile traffic).

    Compute: each (A-block, B-block) pair is one b×b×b bf16 matmul
    (2·b³ flops).  Traffic: both operand tiles stream in per pair
    (2·b²·2 B, bf16) and each output block writes once (b²·4 B, f32 counts).
    SOL = max(compute-bound, bandwidth-bound).
    """
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu").lower()
    bw = next((v for k, v in HBM_BYTES_PER_S.items() if k in kind), 100e9)
    mxu = next((v for k, v in MXU_FLOPS_PER_S.items() if k in kind), 1e12)
    b = block_size
    flops = 2 * n_pairs * b**3
    bytes_moved = n_pairs * 2 * b * b * 2 + n_out_blocks * b * b * 4
    sol_s = max(flops / mxu, bytes_moved / bw)
    return {
        "model": "bsr-mxu",
        "model_flops": flops,
        "model_bytes": bytes_moved,
        "speed_of_light_s": sol_s,
        "achieved_s": seconds,
        "fraction_of_roofline": sol_s / seconds if seconds else 0.0,
        "bandwidth_assumed_gbps": bw / 1e9,
        "mxu_assumed_tflops": mxu / 1e12,
        "bound": "compute" if flops / mxu >= bytes_moved / bw else "bandwidth",
    }
