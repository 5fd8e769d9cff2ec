"""ctypes bindings + lazy build for the native (C++) CSV parser.

The shared library is compiled on first use with g++ into
datafusion_tpu/native/build/ and cached (source mtime keyed). When no
C++ toolchain is available the caller falls back to the pure-Python
parser (columnar/csv.py keeps working everywhere).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from datafusion_tpu.schema import Schema
from datafusion_tpu.types import DataType

_DTYPE_CODE = {
    DataType.Boolean: 0,
    DataType.Int8: 1,
    DataType.Int16: 2,
    DataType.Int32: 3,
    DataType.Int64: 4,
    DataType.UInt8: 5,
    DataType.UInt16: 6,
    DataType.UInt32: 7,
    DataType.UInt64: 8,
    DataType.Float32: 9,
    DataType.Float64: 10,
    DataType.Utf8: 11,
    DataType.Date32: 12,
    DataType.Timestamp: 13,  # seconds since epoch, 'YYYY-MM-DD[ ]HH:MM:SS'
}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build_lib() -> Optional[ctypes.CDLL]:
    src = os.path.join(os.path.dirname(__file__), "..", "native", "csv_parser.cpp")
    src = os.path.abspath(src)
    build_dir = os.path.join(os.path.dirname(src), "build")
    os.makedirs(build_dir, exist_ok=True)
    so = os.path.join(build_dir, "libdftpu_csv.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            "-o", so, src, "-lpthread",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            # some toolchains lack -march=native (e.g. cross images)
            try:
                subprocess.run(
                    [a for a in cmd if a != "-march=native"],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.dftpu_csv_count_rows.restype = ctypes.c_int64
    lib.dftpu_csv_count_rows.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
    ]
    lib.dftpu_csv_index.restype = ctypes.c_void_p
    lib.dftpu_csv_index.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.dftpu_csv_index_free.restype = None
    lib.dftpu_csv_index_free.argtypes = [ctypes.c_void_p]
    lib.dftpu_csv_parse_indexed.restype = ctypes.c_int64
    lib.dftpu_csv_parse_indexed.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.c_int,
    ]
    lib.dftpu_csv_parse.restype = ctypes.c_int64
    lib.dftpu_csv_parse.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.c_int,
    ]
    lib.dftpu_csv_dict_encode.restype = ctypes.c_int64
    lib.dftpu_csv_dict_encode.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is None and not _lib_failed:
            _lib = _build_lib()
            _lib_failed = _lib is None
    return _lib


def count_csv_rows_native(path: str, has_header: bool):
    """Data-row count via the native index pass alone (no field parsing)
    — the cheap metadata pass lazy tables take at registration. None if
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import mmap

    with open(path, "rb") as f:
        size = os.fstat(f.fileno()).st_size
        if size == 0:
            return 0
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        try:
            buf_ptr = ctypes.c_void_p(np.frombuffer(mm, dtype=np.uint8).ctypes.data)
            nrows_out = ctypes.c_int64(0)
            idx = lib.dftpu_csv_index(
                buf_ptr, size, int(has_header), 0, ctypes.byref(nrows_out)
            )
            lib.dftpu_csv_index_free(idx)
            n = int(nrows_out.value)
            return n if n >= 0 else None
        finally:
            mm.close()


def parse_csv_native(path: str, schema: Schema, has_header: bool, columns=None):
    """Parse a CSV with the native loader. Returns (arrays, validity) in
    the format Table.from_arrays expects, or None if the native path is
    unavailable (caller falls back to the Python parser).

    columns: optional collection of column indices to materialize —
    others are SKIPPED in C++ (dtype code -1 matches no switch case: no
    conversion, no buffer writes; the field scan still walks the row)
    and return None entries."""
    lib = get_lib()
    if lib is None:
        return None
    import mmap

    f = open(path, "rb")
    size = os.fstat(f.fileno()).st_size
    mm = None
    idx = None
    if size == 0:
        data: object = b""
        buf_ptr = None
    else:
        # mmap instead of read(): no full-buffer copy, and the parallel
        # index/parse threads fault pages in as they stream
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        data = mm
        # numpy view of the read-only map just to obtain the base pointer
        buf_ptr = ctypes.c_void_p(np.frombuffer(mm, dtype=np.uint8).ctypes.data)
    try:
        nrows_out = ctypes.c_int64(0)
        idx = lib.dftpu_csv_index(
            buf_ptr, size, int(has_header), 0, ctypes.byref(nrows_out)
        )
        n = int(nrows_out.value)
        if n < 0:
            return None
        ncols = len(schema)
        want = None if columns is None else set(columns)
        dtypes = np.array(
            [
                _DTYPE_CODE[f.dtype] if want is None or j in want else -1
                for j, f in enumerate(schema.fields)
            ],
            dtype=np.int32,
        )
        bufs = []
        valids = []
        out_ptrs = (ctypes.c_void_p * ncols)()
        valid_ptrs = (ctypes.c_void_p * ncols)()
        for j, field in enumerate(schema.fields):
            if want is not None and j not in want:
                bufs.append(None)
                valids.append(None)
                out_ptrs[j] = None
                valid_ptrs[j] = None
                continue
            if field.dtype is DataType.Utf8:
                arr = np.zeros((n, 2), dtype=np.int64)  # (offset, length)
            elif field.dtype is DataType.Boolean:
                arr = np.zeros((n,), dtype=np.uint8)
            else:
                arr = np.zeros((n,), dtype=field.dtype.to_np())
            bufs.append(arr)
            out_ptrs[j] = arr.ctypes.data_as(ctypes.c_void_p)
            v = np.zeros((n,), dtype=np.uint8)
            valids.append(v)
            valid_ptrs[j] = v.ctypes.data_as(ctypes.c_void_p)

        parsed = int(
            lib.dftpu_csv_parse_indexed(
                buf_ptr,
                size,
                idx,
                int(has_header),
                ncols,
                dtypes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                out_ptrs,
                valid_ptrs,
                0,
            )
        )
        if parsed != n:
            return None
        return _finish_columns(lib, buf_ptr, data, n, schema, bufs, valids)
    finally:
        if idx is not None:
            lib.dftpu_csv_index_free(idx)
        if mm is not None:
            mm.close()
        f.close()


def _finish_columns(lib, buf_ptr, data, n, schema, bufs, valids):
    arrays = []
    validity = []
    for j, field in enumerate(schema.fields):
        if bufs[j] is None:  # skipped (column-subset parse)
            arrays.append(None)
            validity.append(None)
            continue
        if field.dtype is DataType.Utf8:
            # dictionary-encode in C++ (sorted byte-order vocab == Python
            # str order); only the small vocab is decoded in Python —
            # replaces a per-row decode loop + np.unique over 5M objects
            offs = bufs[j]
            codes = np.zeros((n,), dtype=np.int32)
            vocab_pairs = np.zeros((n, 2), dtype=np.int64)
            k = int(
                lib.dftpu_csv_dict_encode(
                    buf_ptr,
                    offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    n,
                    codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    vocab_pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                )
            )
            vocab = [
                data[vocab_pairs[i, 0] : vocab_pairs[i, 0] + vocab_pairs[i, 1]]
                .decode("utf-8")
                .replace('""', '"')
                for i in range(k)
            ]
            # quote-unescaping can merge or reorder raw-byte entries;
            # re-canonicalize at vocab scale (tiny) when it does
            if any(vocab[i] >= vocab[i + 1] for i in range(k - 1)):
                uvocab, inv = np.unique(
                    np.asarray(vocab, dtype=object).astype(str), return_inverse=True
                )
                codes = inv.astype(np.int32)[codes]
                vocab = uvocab.tolist()
            arrays.append((codes, tuple(vocab)))
            validity.append(None)
        elif field.dtype is DataType.Boolean:
            arrays.append(bufs[j].astype(np.bool_))
            v = valids[j]
            validity.append(None if v.all() else v.astype(np.bool_))
        else:
            arrays.append(bufs[j])
            v = valids[j]
            validity.append(None if v.all() else v.astype(np.bool_))
    if all(v is None for v in validity):
        validity = None
    return arrays, validity
