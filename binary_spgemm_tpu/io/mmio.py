"""Matrix Market ingest/egest for pattern matrices.

Replaces the reference's vendored NIST mmio + ``readCOO`` stack (final/mmio.c,
final/utils.c:47-81).  Reference semantics that matter for bit-exactness, all
reproduced here:

* only the first two whitespace-separated fields of each entry line are used
  (``fscanf("%u %u")``; value columns, if present, are ignored),
* 1-based indices are shifted to 0-based,
* with ``transpose=True`` (the default, matching ``readCOO``) entries are grouped by
  the file's *second* index and the stored column indices are the file's *first*
  index — i.e. the returned matrix is the CSR of the transpose of the file's
  matrix (final/utils.c:77 passes ``(col, row)`` into ``coo2csc``),
* within a group, entries keep file order; duplicates are not merged,
* no symmetric expansion (the reference reads ``general`` pattern files only; we
  additionally support ``symmetric`` with explicit opt-in expansion).
"""
from __future__ import annotations

import os

import numpy as np

from ..formats.bcsr import BCSR
from ..native import format_pairs as native_format_pairs
from ..native import parse_pairs as native_parse_pairs

__all__ = ["read_pattern", "write_pattern", "read_banner", "MMBanner"]


class MMBanner:
    def __init__(self, obj, fmt, field, symmetry):
        self.object = obj
        self.format = fmt
        self.field = field
        self.symmetry = symmetry

    def __repr__(self):
        return (
            f"MMBanner({self.object}, {self.format}, {self.field}, {self.symmetry})"
        )


def read_banner(line: str) -> MMBanner:
    """Parse the ``%%MatrixMarket`` banner (≡ mm_read_banner, final/mmio.c:96-179)."""
    parts = line.strip().split()
    if len(parts) < 5 or parts[0] != "%%MatrixMarket":
        raise ValueError(f"not a MatrixMarket banner: {line!r}")
    _, obj, fmt, field, symmetry = parts[:5]
    return MMBanner(obj.lower(), fmt.lower(), field.lower(), symmetry.lower())


def read_pattern(
    path,
    *,
    transpose: bool = True,
    expand_symmetric: bool = False,
    row_range: tuple[int, int] | None = None,
) -> BCSR:
    """Read a Matrix Market coordinate file as a boolean pattern matrix.

    ``transpose=True`` reproduces the reference ingest exactly (see module
    docstring).  ``expand_symmetric`` mirrors lower-triangle entries for files
    declared ``symmetric`` — the reference does *not* do this (its MATLAB oracle
    compensates with ``tril(A)'``, Matlab/test_mtx.m:3), so it defaults off.

    ``row_range=(lo, hi)`` keeps only rows [lo, hi) of the RESULT matrix and
    returns a ``(hi-lo, cols)``-shaped slice (row ids shifted by -lo) — the
    memory-bounded sharded-ingest path: each process parses the whole file
    but stores only O(local nnz) (filter fused into the native parse), where
    the reference materialises every entry on every rank
    (final/SpGEMM_mpi_omp.c:309).  Pair with
    ``parallel.multihost.process_row_range`` for the per-process bounds.

    Large files are mmapped so OS page-in overlaps the (multi-core, native)
    parse instead of an upfront whole-file read — the ingest pipeline the
    reference lacks (readCOO fscanf's serially on every rank,
    final/utils.c:66-71).
    """
    import mmap

    if row_range is not None and expand_symmetric:
        raise ValueError(
            "row_range with expand_symmetric is not supported (mirrored "
            "entries cross the row filter); expand first, then slice"
        )

    # transparent gzip (SuiteSparse ships .mtx.gz): decompress up front —
    # a compressed stream can't be mmapped, so the body is a zero-copy view
    # over the decompressed buffer instead
    import io

    raw = None
    if str(path).endswith(".gz"):
        import gzip

        with gzip.open(path, "rb") as gz:
            raw = gz.read()

    with (io.BytesIO(raw) if raw is not None else open(path, "rb")) as f:
        size = len(raw) if raw is not None else os.fstat(f.fileno()).st_size
        # Header (banner + comments + size line) from an incrementally-grown
        # prefix read; the body never needs to be materialised up front.
        head = f.read(1 << 16)
        while True:
            nl = head.find(b"\n")
            if nl < 0:
                if len(head) >= size:
                    raise ValueError("missing Matrix-Market banner line")
                head += f.read(len(head))
                continue
            break
        banner = read_banner(head[:nl].decode("ascii", errors="replace"))
        if banner.format != "coordinate":
            raise ValueError(
                f"only coordinate format is supported, got {banner.format}"
            )

        # Size line: first non-comment, non-blank line after the banner.
        pos = nl + 1
        while True:
            nl = head.find(b"\n", pos)
            if nl < 0 and len(head) < size:
                head += f.read(len(head))
                continue
            line = head[pos:] if nl < 0 else head[pos:nl]
            pos = len(head) if nl < 0 else nl + 1
            s = line.strip()
            if s and not s.startswith(b"%"):
                break
            if nl < 0:
                raise ValueError("missing size line")
        n_rows, n_cols, nnz = (int(tok) for tok in s.split()[:3])

        if raw is not None:
            body = memoryview(raw)[pos:]  # head is a prefix of raw
        elif size >= (16 << 20):
            # zero-copy body view over an mmap: the OS pages the file in as
            # the multi-threaded native parser streams through it
            mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
            body = memoryview(mm)[pos:]
        else:
            body = head[pos:] + f.read()
    # Only the first two fields of each entry are used (the reference's
    # fscanf("%u %u"), final/utils.c:66-71); value columns are skipped.
    fields_per_line = {"pattern": 2, "complex": 4}.get(banner.field, 3)
    if row_range is not None and nnz:
        # the result row is the file's SECOND field under transpose
        # semantics, the first otherwise; filter fused into the parse
        lo, hi = (int(x) for x in row_range)
        which = 1 if transpose else 0
        from ..native import parse_pairs_filtered

        parsed = parse_pairs_filtered(
            body, nnz, fields_per_line, which, lo + 1, hi + 1
        )
    else:
        parsed = native_parse_pairs(body, nnz, fields_per_line) if nnz else None
    if parsed is not None:  # fast C parser (native tier)
        rows = parsed[0].astype(np.int64) - 1  # 1-based → 0-based
        cols = parsed[1].astype(np.int64) - 1
    else:  # pure-numpy fallback
        data = (
            np.array(bytes(body).split(), dtype=np.float64)
            if nnz
            else np.zeros(0)
        )
        if nnz and data.size % fields_per_line != 0:
            raise ValueError(
                f"entry count {data.size} not divisible by "
                f"{fields_per_line} fields/line"
            )
        data = data.reshape(-1, fields_per_line) if nnz else data.reshape(0, 2)
        if nnz and data.shape[0] != nnz:
            raise ValueError(f"expected {nnz} entries, found {data.shape[0]}")
        rows = data[:, 0].astype(np.int64) - 1
        cols = data[:, 1].astype(np.int64) - 1

    if banner.symmetry == "symmetric" and expand_symmetric:
        r0, c0 = rows, cols
        off = r0 != c0
        rows = np.concatenate([r0, c0[off]])
        cols = np.concatenate([c0, r0[off]])

    if row_range is not None:
        lo, hi = (int(x) for x in row_range)
        key = cols if transpose else rows  # the field that becomes C's row
        keep = (key >= lo) & (key < hi)
        if not keep.all():  # numpy-fallback path parsed everything
            rows, cols = rows[keep], cols[keep]
        if transpose:
            cols = cols - lo
            shape = (n_rows, hi - lo)  # swapped by from_coo(transpose=True)
        else:
            rows = rows - lo
            shape = (hi - lo, n_cols)
        return BCSR.from_coo(rows, cols, shape, transpose=transpose)

    return BCSR.from_coo(rows, cols, (n_rows, n_cols), transpose=transpose)


def write_integer(
    path, mat: BCSR, values, *, comment: str | None = None
) -> None:
    """Write a matrix with per-entry integer values as
    ``coordinate integer general`` — the value-file write path of the
    reference's vendored NIST mmio that its binaries never wired up
    (``mm_write_mtx_crd``, final/mmio.c:399).  Used for counting-SpGEMM
    results (``spgemm_counts``' multiplicities); transparent gzip on the
    ``.gz`` suffix like :func:`write_pattern`.  A file written here reads
    back through :func:`read_pattern` as its support (value columns are
    skipped, ≡ the reference's ``fscanf("%u %u")``)."""
    values = np.asarray(values)
    if values.shape != (mat.nnz,):
        raise ValueError(
            f"values shape {values.shape} != (nnz,) = ({mat.nnz},)"
        )
    if not np.issubdtype(values.dtype, np.integer):
        raise ValueError(
            f"write_integer requires integer values, got dtype {values.dtype}"
            " (cast explicitly if truncation is intended)"
        )
    rows, cols = mat.to_coo()
    if str(path).endswith(".gz"):
        import gzip

        opener = gzip.open
    else:
        opener = open
    with opener(path, "wb") as f:
        f.write(b"%%MatrixMarket matrix coordinate integer general\n")
        if comment:
            for line in comment.splitlines():
                f.write(f"% {line}\n".encode())
        f.write(f"{mat.n_rows} {mat.n_cols} {mat.nnz}\n".encode())
        np.savetxt(
            f,
            np.column_stack(
                [rows.astype(np.int64) + 1, cols.astype(np.int64) + 1, values]
            ),
            fmt="%d %d %d",
        )


def write_pattern(path, mat: BCSR, *, comment: str | None = None) -> None:
    """Write a boolean pattern matrix as ``coordinate pattern general``.

    Mirrors the output format of Matlab/write_spm.m:5-8 / mmwrite.m: banner, size
    line, then 1-based ``row col`` pairs.
    """
    rows, cols = mat.to_coo()
    if str(path).endswith(".gz"):
        import gzip

        opener = gzip.open
    else:
        opener = open
    with opener(path, "wb") as f:
        f.write(b"%%MatrixMarket matrix coordinate pattern general\n")
        if comment:
            for line in comment.splitlines():
                f.write(f"% {line}\n".encode())
        f.write(f"{mat.n_rows} {mat.n_cols} {mat.nnz}\n".encode())
        body = native_format_pairs(rows, cols)
        if body is not None:
            f.write(body)
        else:
            np.savetxt(f, np.column_stack([rows + 1, cols + 1]), fmt="%d %d")
