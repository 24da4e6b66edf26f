"""Device-resident op entry points over :class:`DeviceBCSR`.

For pipelines that keep matrices in HBM across many ops (iterated products,
reachability closures, benchmark loops), these avoid the host round-trips of
the convenience API in :mod:`.spgemm`:  inputs and outputs are DeviceBCSR with
padded index arrays and traced nnz scalars; nothing syncs to the host.

The output's ``indices`` array is padded to the flop bound of the product —
call :meth:`DeviceBCSR.compact` (host sync) or feed it onward.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .spgemm import INT, DeviceBCSR, esc_spgemm
from .union import spm_or_padded

__all__ = [
    "spgemm_device",
    "spm_or_device",
    "spgemm_or_device",
    "masked_spgemm_device",
    "spgemm_counts_device",
    "masked_spgemm_counts_device",
    "counts_sum_device",
    "flops_bound_device",
]


def flops_bound_device(a: DeviceBCSR, b: DeviceBCSR) -> jax.Array:
    """Traced Gustavson flop count of a·b (device scalar, no host sync).

    int32, like the whole framework's index domain (must be < 2^31; the host
    APIs enforce this via chunking/overflow guards).
    """
    valid = jnp.arange(a.indices.shape[0], dtype=INT) < a.nnz
    acol = jnp.where(valid, a.indices, 0)
    blen = b.indptr[acol + 1] - b.indptr[acol]
    return jnp.sum(jnp.where(valid, blen, 0), dtype=INT)


def spgemm_device(
    a: DeviceBCSR, b: DeviceBCSR, *, flops_pad: int
) -> DeviceBCSR:
    """C = A·B structure entirely on device.

    ``flops_pad`` must be a static upper bound on the Gustavson flop count
    (e.g. from a previous :func:`flops_bound_device` sync, or an analytic
    bound); the kernel output is padded to it.
    """
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
    c_ptr, c_idx, nnz_c = esc_spgemm(
        a.indptr, a.indices, a.nnz, b.indptr, b.indices,
        n_cols=b.shape[1], flops_pad=flops_pad,
    )
    return DeviceBCSR(c_ptr, c_idx, nnz_c, (a.shape[0], b.shape[1]))


def spm_or_device(a: DeviceBCSR, b: DeviceBCSR) -> DeviceBCSR:
    """C = A OR B entirely on device."""
    if tuple(a.shape) != tuple(b.shape):
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    c_ptr, c_idx, nnz_c = spm_or_padded(
        a.indptr, a.indices, a.nnz, b.indptr, b.indices, b.nnz,
        n_cols=a.shape[1],
    )
    return DeviceBCSR(c_ptr, c_idx, nnz_c, tuple(a.shape))


def spgemm_or_device(
    d: DeviceBCSR,
    a: DeviceBCSR,
    b: DeviceBCSR,
    *,
    flops_pad: int,
    mask: DeviceBCSR | None = None,
) -> DeviceBCSR:
    """C = D OR (A·B), optionally D OR (mask .* (A·B)), entirely on device.

    The fused form of :func:`spgemm_device` + :func:`spm_or_device` in one
    sort (≡ ``SpGEMM_dor``/``SpGEMM_dor_masked``, old/BSpGEMM.c:75-254) —
    the accumulate step of device-resident iterated products (reachability
    closures, k-hop frontiers).  ``mask`` must be canonical (sorted,
    deduplicated) like every mask operand.
    """
    from .fused import spgemm_or_padded

    if a.shape[1] != b.shape[0] or tuple(d.shape) != (a.shape[0], b.shape[1]):
        raise ValueError(f"shape mismatch: D{d.shape} vs {a.shape} @ {b.shape}")
    args = [
        d.indptr, d.indices, d.nnz,
        a.indptr, a.indices, a.nnz,
        b.indptr, b.indices,
    ]
    if mask is not None:
        if tuple(mask.shape) != tuple(d.shape):
            raise ValueError(f"mask shape {mask.shape} != {d.shape}")
        args += [mask.indptr, mask.indices]
    c_ptr, c_idx, nnz_c = spgemm_or_padded(
        *args, n_cols=b.shape[1], flops_pad=flops_pad
    )
    return DeviceBCSR(c_ptr, c_idx, nnz_c, tuple(d.shape))


def spgemm_counts_device(
    a: DeviceBCSR, b: DeviceBCSR, *, flops_pad: int
) -> tuple[DeviceBCSR, jax.Array]:
    """C = A·B structure + per-entry multiplicities entirely on device.

    Returns ``(c, counts)`` with ``counts`` padded like ``c.indices``
    (slots past ``c.nnz`` are 0).  Operands must be canonical — duplicate
    entries would inflate multiplicities (the host API canonicalises;
    device-resident pipelines must guarantee it themselves — stage inputs
    with ``DeviceBCSR.from_host(mat, require_canonical=True)``).
    """
    from .counts import sort_compress_counts
    from .spgemm import expand_pairs

    if a.shape[1] != b.shape[0]:
        raise ValueError(f"shape mismatch: {a.shape} @ {b.shape}")
    row, col = expand_pairs(
        a.indptr, a.indices, a.nnz, b.indptr, b.indices,
        n_cols=b.shape[1], flops_pad=flops_pad,
    )
    c_ptr, c_idx, c_cnt, nnz_c = sort_compress_counts(
        row, col, a.shape[0], b.shape[1]
    )
    return DeviceBCSR(c_ptr, c_idx, nnz_c, (a.shape[0], b.shape[1])), c_cnt


def masked_spgemm_counts_device(
    f: DeviceBCSR, a: DeviceBCSR, b: DeviceBCSR, *, flops_pad: int
) -> tuple[DeviceBCSR, jax.Array]:
    """C = F .* (A·B) structure + multiplicities entirely on device (mask
    FIRST).  ``f`` and the operands must be canonical."""
    from .counts import masked_counts_compress
    from .spgemm import expand_pairs

    if a.shape[1] != b.shape[0] or tuple(f.shape) != (a.shape[0], b.shape[1]):
        raise ValueError(f"shape mismatch: F{f.shape} vs {a.shape} @ {b.shape}")
    row, col = expand_pairs(
        a.indptr, a.indices, a.nnz, b.indptr, b.indices,
        n_cols=b.shape[1], flops_pad=flops_pad,
    )
    c_ptr, c_idx, c_cnt, nnz_c = masked_counts_compress(
        row, col, f.indptr, f.indices, f.nnz, a.shape[0], b.shape[1]
    )
    return DeviceBCSR(c_ptr, c_idx, nnz_c, tuple(f.shape)), c_cnt


def counts_sum_device(
    f: DeviceBCSR, a: DeviceBCSR, b: DeviceBCSR, *, flops_pad: int
) -> jax.Array:
    """Σ over mask entries (i, j) of the multiplicity of (A·B)[i, j] — one
    traced int32 scalar, nothing syncs to the host.  With f = a = b = a
    symmetric hollow adjacency this is 6× the triangle count (the
    device-resident form of :func:`..counts.triangle_count_device`'s
    per-chunk kernel)."""
    from .counts import masked_counts_sum
    from .spgemm import expand_pairs

    if a.shape[1] != b.shape[0] or tuple(f.shape) != (a.shape[0], b.shape[1]):
        raise ValueError(f"shape mismatch: F{f.shape} vs {a.shape} @ {b.shape}")
    row, col = expand_pairs(
        a.indptr, a.indices, a.nnz, b.indptr, b.indices,
        n_cols=b.shape[1], flops_pad=flops_pad,
    )
    return masked_counts_sum(
        row, col, f.indptr, f.indices, f.nnz, a.shape[0], b.shape[1]
    )


def masked_spgemm_device(
    f: DeviceBCSR, a: DeviceBCSR, b: DeviceBCSR, *, flops_pad: int
) -> DeviceBCSR:
    """C = F .* (A·B) entirely on device (mask FIRST, like
    :func:`..masked.masked_spgemm`).  ``f`` must be canonical."""
    from .masked import masked_spgemm_padded

    if a.shape[1] != b.shape[0] or tuple(f.shape) != (a.shape[0], b.shape[1]):
        raise ValueError(f"shape mismatch: F{f.shape} vs {a.shape} @ {b.shape}")
    c_ptr, c_idx, nnz_c = masked_spgemm_padded(
        f.indptr, f.indices, a.indptr, a.indices, a.nnz,
        b.indptr, b.indices, n_cols=b.shape[1], flops_pad=flops_pad,
    )
    return DeviceBCSR(c_ptr, c_idx, nnz_c, tuple(f.shape))
