"""ctypes bindings for the parallel .npy batch loader (npy_loader.c).

The training datasets use `read_npy_many` to fill all of a batch's
preprocessed artifact slices (mel/pitch/energy/attn-prior) with one
GIL-free call into a C thread pool — the native stand-in for the
reference's torch DataLoader worker processes. Falls back gracefully when
no C compiler is available (`available()` is False and callers use
np.load)."""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional

_SOURCE = Path(__file__).parent / "npy_loader.c"


def _build() -> Optional[ctypes.CDLL]:
    from everyvoice_tpu.native import build_shared_library

    lib = build_shared_library(_SOURCE, extra_flags=("-pthread",))
    lib.npy_header.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
    ]
    lib.npy_header.restype = ctypes.c_int
    lib.npy_read_into.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_int, ctypes.c_int,
    ]
    lib.npy_read_into.restype = ctypes.c_long
    lib.npy_read_many.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long), ctypes.c_int, ctypes.c_int,
    ]
    lib.npy_read_many.restype = ctypes.c_int
    return lib


try:
    _lib = _build()
except Exception:  # pragma: no cover - environment without a C compiler
    _lib = None


def available() -> bool:
    return _lib is not None


def npy_header(path) -> tuple:
    """(rows, cols, is_float) for a supported .npy file (1-D files report
    rows=1)."""
    assert _lib is not None
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    is_float = ctypes.c_int()
    rc = _lib.npy_header(
        str(path).encode(), ctypes.byref(rows), ctypes.byref(cols),
        ctypes.byref(is_float),
    )
    if rc != 0:
        raise OSError(f"npy_header({path}) failed")
    return rows.value, cols.value, bool(is_float.value)


def _expect_float(dst) -> int:
    """dst must be 4-byte float32 or int32; the C reader refuses any file
    whose dtype disagrees (return -2) rather than bit-reinterpreting."""
    import numpy as np

    if dst.dtype == np.float32:
        return 1
    if dst.dtype == np.int32:
        return 0
    raise TypeError(f"native npy loader needs float32/int32 dst, got {dst.dtype}")


def read_npy_into(path, dst, transpose: bool = False) -> int:
    """Fill the 2-D C-contiguous-rows numpy view `dst` from `path`,
    truncating to dst's shape; returns rows written."""
    assert _lib is not None
    rows, cols = dst.shape
    stride = dst.strides[0] // dst.itemsize
    n = _lib.npy_read_into(
        str(path).encode(), dst.ctypes.data_as(ctypes.c_void_p),
        rows, cols, stride, int(transpose), _expect_float(dst),
    )
    if n < 0:
        raise OSError(f"npy_read_into({path}) failed (code {n})")
    return n


def read_npy_many(tasks, n_threads: Optional[int] = None) -> list:
    """tasks: list of (path, dst_2d_view, transpose). Fills every dst in a
    C thread pool; returns rows written per task (-1 marks a failed file)."""
    assert _lib is not None
    if not tasks:
        return []
    n = len(tasks)
    paths = (ctypes.c_char_p * n)(
        *(str(t[0]).encode() for t in tasks)
    )
    dsts = (ctypes.c_void_p * n)(
        *(t[1].ctypes.data_as(ctypes.c_void_p).value for t in tasks)
    )
    max_rows = (ctypes.c_long * n)(*(t[1].shape[0] for t in tasks))
    max_cols = (ctypes.c_long * n)(*(t[1].shape[1] for t in tasks))
    strides = (ctypes.c_long * n)(
        *(t[1].strides[0] // t[1].itemsize for t in tasks)
    )
    transposes = (ctypes.c_int * n)(*(int(t[2]) for t in tasks))
    expect_floats = (ctypes.c_int * n)(*(_expect_float(t[1]) for t in tasks))
    rows_out = (ctypes.c_long * n)()
    if n_threads is None:
        n_threads = min(os.cpu_count() or 4, 16)
    _lib.npy_read_many(
        paths, dsts, max_rows, max_cols, strides, transposes, expect_floats,
        rows_out, n, n_threads,
    )
    return list(rows_out)
