"""ctypes bindings for the native C++ CSV loader (native/csv_loader.cpp).

Builds libsqlrs_csv.so on demand via `make -C native` and exposes
read_csv_native() with the same contract as storage/csv.read_csv_file (which
remains the semantics source of truth and the fallback when no toolchain is
available). The env var SQLRS_TPU_NATIVE_CSV=0 disables the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from sqlrs_tpu.data.strings import GLOBAL_STRINGS
from sqlrs_tpu.errors import StorageError
from sqlrs_tpu.storage.csv import CsvConfig
from sqlrs_tpu.storage.memory import DataTable
from sqlrs_tpu.types import LogicalType

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsqlrs_csv.so")
_TYPE_MAP = {
    0: LogicalType.BIGINT,
    1: LogicalType.DOUBLE,
    2: LogicalType.BOOLEAN,
    3: LogicalType.DATE,
    4: LogicalType.VARCHAR,
}
_NP_MAP = {0: np.int64, 1: np.float64, 2: np.uint8, 3: np.int32}

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if os.environ.get("SQLRS_TPU_NATIVE_CSV", "1") == "0":
            _lib_failed = True
            return None
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception:
            _lib_failed = True
            return None
        lib.csv_load.restype = ctypes.c_void_p
        lib.csv_load.argtypes = [ctypes.c_char_p, ctypes.c_char, ctypes.c_int]
        lib.csv_error.restype = ctypes.c_char_p
        lib.csv_error.argtypes = [ctypes.c_void_p]
        lib.csv_num_rows.restype = ctypes.c_int64
        lib.csv_num_rows.argtypes = [ctypes.c_void_p]
        lib.csv_num_cols.restype = ctypes.c_int64
        lib.csv_num_cols.argtypes = [ctypes.c_void_p]
        lib.csv_col_name.restype = ctypes.c_char_p
        lib.csv_col_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.csv_col_type.restype = ctypes.c_int32
        lib.csv_col_type.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.csv_col_data.restype = ctypes.c_void_p
        lib.csv_col_data.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.csv_col_valid.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.csv_col_valid.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.csv_col_str_bytes.restype = ctypes.c_void_p
        lib.csv_col_str_bytes.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.csv_col_str_offsets.restype = ctypes.POINTER(ctypes.c_int64)
        lib.csv_col_str_offsets.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.csv_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_lib() is not None


def read_csv_native(path: str, config: CsvConfig | None = None) -> DataTable:
    lib = _load_lib()
    if lib is None:
        raise StorageError("native csv loader unavailable")
    config = config or CsvConfig()
    handle = lib.csv_load(
        path.encode(), config.delimiter.encode()[:1], int(config.has_header)
    )
    try:
        err = lib.csv_error(handle)
        if err:
            raise StorageError(f"native csv {path!r}: {err.decode()}")
        n = lib.csv_num_rows(handle)
        ncols = lib.csv_num_cols(handle)
        names, types, datas, valids = [], [], [], []
        for i in range(ncols):
            names.append(lib.csv_col_name(handle, i).decode())
            tc = lib.csv_col_type(handle, i)
            t = _TYPE_MAP[tc]
            types.append(t)
            valid = np.ctypeslib.as_array(lib.csv_col_valid(handle, i), (n,)).astype(
                np.bool_
            )
            if tc == 4:  # utf8 -> intern codes
                offs = np.ctypeslib.as_array(
                    lib.csv_col_str_offsets(handle, i), (n + 1,)
                ).copy()
                total = int(offs[-1])
                raw = ctypes.string_at(lib.csv_col_str_bytes(handle, i), total)
                data = np.empty(n, dtype=np.int32)
                intern = GLOBAL_STRINGS.intern
                for r in range(n):
                    data[r] = intern(raw[offs[r] : offs[r + 1]].decode("utf-8"))
            else:
                ptr = ctypes.cast(
                    lib.csv_col_data(handle, i),
                    ctypes.POINTER(
                        np.ctypeslib.as_ctypes_type(np.dtype(_NP_MAP[tc]))
                    ),
                )
                data = np.ctypeslib.as_array(ptr, (n,)).copy()
                if tc == 2:
                    data = data.astype(np.bool_)
            datas.append(data)
            valids.append(valid)
        table = DataTable(names, types)
        table.append_numpy(datas, valids)
        return table
    finally:
        lib.csv_free(handle)
