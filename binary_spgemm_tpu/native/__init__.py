"""Native (C) components, loaded via ctypes with build-on-demand.

The reference's ingest tier is C (readCOO/mmio); this package provides the
native equivalents.  ``lib()`` compiles ``libmmparse.so`` on first use with the
system compiler and caches it next to the source; everything degrades to the
pure-numpy fallbacks in :mod:`..io.mmio` when no toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmmparse.so")
_SRC = os.path.join(_DIR, "mmparse.c")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # OpenMP first (parallel parse/convert tiers); plain build as fallback
    for extra in (["-fopenmp"], []):
        for cc in ("cc", "gcc", "clang"):
            try:
                subprocess.run(
                    [cc, "-O3", *extra, "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                return True
            except (OSError, subprocess.SubprocessError):
                continue
    return False


def lib():
    """The loaded native library, or None if unavailable (or disabled via
    ``BINARY_SPGEMM_NO_NATIVE=1`` — the kill switch forcing every caller onto
    its pure-numpy fallback)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        if os.environ.get("BINARY_SPGEMM_NO_NATIVE"):
            _tried = True
            return None
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            l = ctypes.CDLL(_SO)
        except OSError:
            return None
        l.mm_parse_pairs.restype = ctypes.c_long
        l.mm_parse_pairs.argtypes = [
            ctypes.c_void_p,  # bytes or a raw buffer address (mmap path)
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        l.mm_format_pairs.restype = ctypes.c_long
        l.mm_format_pairs.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_long,
            ctypes.c_char_p,
        ]
        if hasattr(l, "mm_parse_pairs_filtered"):
            l.mm_parse_pairs_filtered.restype = ctypes.c_long
            l.mm_parse_pairs_filtered.argtypes = [
                ctypes.c_void_p,
                ctypes.c_long,
                ctypes.c_long,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_uint32,
                ctypes.c_uint32,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_long,
            ]
        if hasattr(l, "mm_parse_pairs_par"):
            l.mm_parse_pairs_par.restype = ctypes.c_long
            l.mm_parse_pairs_par.argtypes = [
                ctypes.c_void_p,
                ctypes.c_long,
                ctypes.c_long,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_int,
            ]
        if hasattr(l, "coo2csr_stable_par"):
            l.coo2csr_stable_par.restype = ctypes.c_long
            l.coo2csr_stable_par.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_long,
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_int,
            ]
        if hasattr(l, "coo2csr_stable"):
            l.coo2csr_stable.restype = ctypes.c_long
            l.coo2csr_stable.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_long,
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
            ]
        if hasattr(l, "ell_class_partition"):
            l.ell_class_partition.restype = ctypes.c_long
            l.ell_class_partition.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),  # indptr
                ctypes.c_long,  # n_rows
                ctypes.POINTER(ctypes.c_int32),  # cols
                ctypes.c_long,  # nnz
                ctypes.POINTER(ctypes.c_int32),  # class_of_row
                ctypes.POINTER(ctypes.c_int32),  # pos_in_class
                ctypes.c_int,  # n_classes
                ctypes.POINTER(ctypes.c_int32),  # out_rows
                ctypes.POINTER(ctypes.c_int32),  # out_pos
                ctypes.POINTER(ctypes.c_long),  # cuts
                ctypes.c_int,  # nthreads
            ]
        if hasattr(l, "csr_row_weight"):
            l.csr_row_weight.restype = ctypes.c_long
            l.csr_row_weight.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),  # indptr
                ctypes.c_long,  # n_rows
                ctypes.POINTER(ctypes.c_int32),  # cols
                ctypes.POINTER(ctypes.c_int64),  # weight
                ctypes.POINTER(ctypes.c_int64),  # out
                ctypes.c_int,  # nthreads
            ]
        if hasattr(l, "ell_table_fill"):
            l.ell_table_fill.restype = ctypes.c_long
            l.ell_table_fill.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),  # indptr
                ctypes.c_long,  # n_rows
                ctypes.POINTER(ctypes.c_int32),  # indices
                ctypes.POINTER(ctypes.c_int32),  # class_of_row
                ctypes.POINTER(ctypes.c_int32),  # pos_in_class
                ctypes.POINTER(ctypes.c_void_p),  # tables
                ctypes.POINTER(ctypes.c_long),  # widths
                ctypes.c_int32,  # sentinel
                ctypes.c_int,  # nthreads
            ]
        _u32p = ctypes.POINTER(ctypes.c_uint32)
        _i32p = ctypes.POINTER(ctypes.c_int32)
        _i64p = ctypes.POINTER(ctypes.c_int64)
        if hasattr(l, "spgemm_host"):
            l.spgemm_host.restype = ctypes.c_long
            l.spgemm_host.argtypes = [
                _u32p, _i32p, ctypes.c_long, ctypes.c_long,
                _u32p, _i32p, _u32p, _i32p, ctypes.c_long,
            ]
        if hasattr(l, "masked_spgemm_host"):
            l.masked_spgemm_host.restype = ctypes.c_long
            l.masked_spgemm_host.argtypes = [
                _u32p, _i32p, _u32p, _i32p, ctypes.c_long, ctypes.c_long,
                _u32p, _i32p, _u32p, _i32p, ctypes.c_long,
            ]
        if hasattr(l, "spgemm_counts_host"):
            l.spgemm_counts_host.restype = ctypes.c_long
            l.spgemm_counts_host.argtypes = [
                _u32p, _i32p, ctypes.c_long, ctypes.c_long,
                _u32p, _i32p, _u32p, _i32p, _i64p, ctypes.c_long,
            ]
        _lib = l
        return _lib


def parse_pairs(body, nnz: int, fields: int):
    """Parse ``nnz`` 'row col [val]' entries; returns 1-based uint32 arrays or
    None when the native library is unavailable.  Raises ValueError on
    malformed or truncated input (the caller formats the message).

    ``body`` is bytes or any readable buffer (memoryview over an mmap — the
    zero-copy path: page-in then overlaps the parse instead of an upfront
    whole-file read)."""
    l = lib()
    if l is None:
        return None
    if not isinstance(body, bytes):
        buf = np.frombuffer(body, dtype=np.uint8)
        addr, blen = buf.ctypes.data, len(buf)
    else:
        addr, blen = body, len(body)
    rows = np.empty(nnz, dtype=np.uint32)
    cols = np.empty(nnz, dtype=np.uint32)
    got = -2
    if hasattr(l, "mm_parse_pairs_par") and blen >= (1 << 20):
        got = l.mm_parse_pairs_par(
            addr,
            blen,
            nnz,
            fields,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            os.cpu_count() or 1,
        )
    if got == -2:  # layout defeated the parallel split: serial decides
        got = l.mm_parse_pairs(
            addr,
            blen,
            nnz,
            fields,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
    if got < 0:
        raise ValueError("malformed Matrix-Market entry body")
    if got != nnz:
        raise ValueError(f"expected {nnz} entries, found {got}")
    return rows, cols


def parse_pairs_filtered(body, nnz: int, fields: int, which: int,
                         vlo: int, vhi: int):
    """Memory-bounded filtered parse: keep entries whose 1-based field
    ``which`` lies in [vlo, vhi).  Two native passes (count, then fill into
    exactly-sized arrays) so a process never materialises out-of-range
    entries.  Returns 1-based uint32 arrays, or None without the native
    library (caller falls back to parse-then-filter)."""
    l = lib()
    if l is None or not hasattr(l, "mm_parse_pairs_filtered"):
        return None
    if not isinstance(body, bytes):
        buf = np.frombuffer(body, dtype=np.uint8)
        addr, blen = buf.ctypes.data, len(buf)
    else:
        addr, blen = body, len(body)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    count = l.mm_parse_pairs_filtered(
        addr, blen, nnz, fields, which, vlo, vhi, None, None, 0
    )
    if count < 0:
        raise ValueError("malformed Matrix-Market entry body")
    rows = np.empty(count, dtype=np.uint32)
    cols = np.empty(count, dtype=np.uint32)
    got = l.mm_parse_pairs_filtered(
        addr, blen, nnz, fields, which, vlo, vhi,
        rows.ctypes.data_as(u32p), cols.ctypes.data_as(u32p), count,
    )
    if got != count:
        raise ValueError("malformed Matrix-Market entry body")
    return rows, cols


def format_pairs(rows: np.ndarray, cols: np.ndarray):
    """Format 0-based pairs as 1-based 'row col\\n' ASCII bytes, or None."""
    l = lib()
    if l is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.uint32)
    cols = np.ascontiguousarray(cols, dtype=np.uint32)
    n = len(rows)
    out = ctypes.create_string_buffer(22 * n if n else 1)
    wrote = l.mm_format_pairs(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n,
        out,
    )
    return out.raw[:wrote]


def coo2csr(rows: np.ndarray, cols: np.ndarray, n_rows: int):
    """Stable COO->CSR via the native write-cursor scatter; None when the
    native library is unavailable.  Raises ValueError on out-of-range rows."""
    l = lib()
    if l is None or not hasattr(l, "coo2csr_stable"):
        return None
    rows = np.ascontiguousarray(rows, dtype=np.uint32)
    cols = np.ascontiguousarray(cols, dtype=np.uint32)
    nnz = len(rows)
    indptr = np.empty(n_rows + 1, dtype=np.uint32)
    indices = np.empty(nnz, dtype=np.uint32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    ncpu = os.cpu_count() or 1
    if (
        hasattr(l, "coo2csr_stable_par")
        and nnz >= (1 << 20)
        and ncpu > 1
        and n_rows >= ncpu
    ):
        tmp_rows = np.empty(nnz, dtype=np.uint32)
        tmp_cols = np.empty(nnz, dtype=np.uint32)
        rc = l.coo2csr_stable_par(
            rows.ctypes.data_as(u32p),
            cols.ctypes.data_as(u32p),
            nnz,
            n_rows,
            indptr.ctypes.data_as(u32p),
            indices.ctypes.data_as(u32p),
            tmp_rows.ctypes.data_as(u32p),
            tmp_cols.ctypes.data_as(u32p),
            ncpu,
        )
    else:
        rc = l.coo2csr_stable(
            rows.ctypes.data_as(u32p),
            cols.ctypes.data_as(u32p),
            nnz,
            n_rows,
            indptr.ctypes.data_as(u32p),
            indices.ctypes.data_as(u32p),
        )
    if rc != 0:
        raise ValueError("row index out of range in COO->CSR")
    return indptr, indices


def class_partition(indptr, indices, class_of_row, pos_in_class, n_classes):
    """Stable per-class partition of CSR entries (native tier of
    ops/ell.py::_build_class_entries — all host cores via the OpenMP
    counting sort).  Returns per-class ``(entry_rows, entry_pos)`` int32
    list pairs, or None when the native library is unavailable."""
    l = lib()
    if l is None or not hasattr(l, "ell_class_partition") or n_classes == 0:
        return None
    if len(indices) > np.iinfo(np.int32).max:  # uint32 indptr domain
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.uint32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    class_of_row = np.ascontiguousarray(class_of_row, dtype=np.int32)
    pos_in_class = np.ascontiguousarray(pos_in_class, dtype=np.int32)
    nnz = len(indices)
    out_rows = np.empty(nnz, np.int32)
    out_pos = np.empty(nnz, np.int32)
    cuts = np.empty(n_classes + 1, np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    kept = l.ell_class_partition(
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        len(indptr) - 1,
        indices.ctypes.data_as(i32p),
        nnz,
        class_of_row.ctypes.data_as(i32p),
        pos_in_class.ctypes.data_as(i32p),
        n_classes,
        out_rows.ctypes.data_as(i32p),
        out_pos.ctypes.data_as(i32p),
        cuts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        os.cpu_count() or 1,
    )
    if kept < 0:
        return None
    rows_pc = [out_rows[cuts[c] : cuts[c + 1]] for c in range(n_classes)]
    pos_pc = [out_pos[cuts[c] : cuts[c + 1]] for c in range(n_classes)]
    return rows_pc, pos_pc


def row_weight(indptr, cols, weight):
    """Per-row weighted entry sums over a CSR structure (native tier of
    ops/spgemm.py::row_flops and the ELL padded-weight plan input).
    Returns int64[n_rows], or None when the native library is unavailable."""
    l = lib()
    if l is None or not hasattr(l, "csr_row_weight"):
        return None
    if len(cols) > np.iinfo(np.int32).max:  # uint32 indptr domain
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.uint32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    weight = np.ascontiguousarray(weight, dtype=np.int64)
    # the C loop reads weight[cols[e]] unchecked; keep the numpy fallback's
    # bounds behaviour rather than a silent out-of-range heap read
    if len(cols) and int(cols.max()) >= len(weight):
        raise IndexError(
            f"column id {int(cols.max())} out of range for {len(weight)} rows"
        )
    n_rows = len(indptr) - 1
    out = np.empty(n_rows, np.int64)
    l.csr_row_weight(
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n_rows,
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        weight.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        os.cpu_count() or 1,
    )
    return out


def table_fill(indptr, indices, class_of_row, pos_in_class, tables, sentinel):
    """Fill pre-allocated sliced-ELLPACK class tables in one parallel pass
    (native tier of EllB.build's per-class scatter).  ``tables`` is a list of
    np.empty [n_rows_c, width_c] int32 arrays, written in place.  Returns
    True, or None when the native library is unavailable."""
    l = lib()
    if l is None or not hasattr(l, "ell_table_fill") or not tables:
        return None
    if len(indices) > np.iinfo(np.int32).max:  # uint32 indptr domain
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.uint32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    class_of_row = np.ascontiguousarray(class_of_row, dtype=np.int32)
    pos_in_class = np.ascontiguousarray(pos_in_class, dtype=np.int32)
    ptrs = (ctypes.c_void_p * len(tables))(
        *[t.ctypes.data for t in tables]
    )
    widths = np.array([t.shape[1] for t in tables], dtype=np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    l.ell_table_fill(
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        len(indptr) - 1,
        indices.ctypes.data_as(i32p),
        class_of_row.ctypes.data_as(i32p),
        pos_in_class.ctypes.data_as(i32p),
        ptrs,
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        sentinel,
        os.cpu_count() or 1,
    )
    return True


def _csr_args(indptr: np.ndarray, indices: np.ndarray):
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    ptr = np.ascontiguousarray(indptr, dtype=np.uint32)
    idx = np.ascontiguousarray(indices, dtype=np.int32)
    return (ptr, idx,
            ptr.ctypes.data_as(u32p), idx.ctypes.data_as(i32p))


def spgemm_host(a_indptr, a_indices, n_rows, n_cols,
                b_indptr, b_indices, cap: int):
    """Boolean Gustavson SpGEMM on the host (stamp-SPA C kernel); returns
    ``(indptr_u32, indices_i32, nnz)`` or None when native is unavailable."""
    l = lib()
    if l is None or not hasattr(l, "spgemm_host"):
        return None
    _a0, _a1, ap, ai = _csr_args(a_indptr, a_indices)
    _b0, _b1, bp, bi = _csr_args(b_indptr, b_indices)
    c_ptr = np.empty(n_rows + 1, dtype=np.uint32)
    c_idx = np.empty(max(cap, 1), dtype=np.int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    out = l.spgemm_host(
        ap, ai, n_rows, n_cols, bp, bi,
        c_ptr.ctypes.data_as(u32p), c_idx.ctypes.data_as(i32p), cap,
    )
    if out == -1:
        raise ValueError(f"host SpGEMM output exceeded cap={cap}")
    if out < 0:
        return None  # allocation failure: numpy fallback decides
    return c_ptr, c_idx[:out], int(out)


def masked_spgemm_host(f_indptr, f_indices, a_indptr, a_indices,
                       n_rows, n_cols, b_indptr, b_indices, cap: int):
    """C = F .* (A*B) on the host (single allow-stamp C kernel); returns
    ``(indptr_u32, indices_i32, nnz)`` or None when native is unavailable."""
    l = lib()
    if l is None or not hasattr(l, "masked_spgemm_host"):
        return None
    _f0, _f1, fp, fi = _csr_args(f_indptr, f_indices)
    _a0, _a1, ap, ai = _csr_args(a_indptr, a_indices)
    _b0, _b1, bp, bi = _csr_args(b_indptr, b_indices)
    c_ptr = np.empty(n_rows + 1, dtype=np.uint32)
    c_idx = np.empty(max(cap, 1), dtype=np.int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    out = l.masked_spgemm_host(
        fp, fi, ap, ai, n_rows, n_cols, bp, bi,
        c_ptr.ctypes.data_as(u32p), c_idx.ctypes.data_as(i32p), cap,
    )
    if out == -1:
        raise ValueError(f"host masked SpGEMM output exceeded cap={cap}")
    if out < 0:
        return None
    return c_ptr, c_idx[:out], int(out)


def spgemm_counts_host(a_indptr, a_indices, n_rows, n_cols,
                       b_indptr, b_indices, cap: int):
    """Counting SpGEMM on the host; returns
    ``(indptr_u32, indices_i32, counts_i64, nnz)`` or None."""
    l = lib()
    if l is None or not hasattr(l, "spgemm_counts_host"):
        return None
    _a0, _a1, ap, ai = _csr_args(a_indptr, a_indices)
    _b0, _b1, bp, bi = _csr_args(b_indptr, b_indices)
    c_ptr = np.empty(n_rows + 1, dtype=np.uint32)
    c_idx = np.empty(max(cap, 1), dtype=np.int32)
    c_cnt = np.empty(max(cap, 1), dtype=np.int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    out = l.spgemm_counts_host(
        ap, ai, n_rows, n_cols, bp, bi,
        c_ptr.ctypes.data_as(u32p), c_idx.ctypes.data_as(i32p),
        c_cnt.ctypes.data_as(i64p), cap,
    )
    if out == -1:
        raise ValueError(f"host counts SpGEMM output exceeded cap={cap}")
    if out < 0:
        return None
    return c_ptr, c_idx[:out], c_cnt[:out], int(out)
