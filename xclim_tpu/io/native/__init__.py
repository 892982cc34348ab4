"""ctypes bindings for the native NetCDF3 reader (compiled on first use).

The native library mmaps the file and byte-swaps variables with multiple
threads — the framework's fast IO path for classic NetCDF inputs. Falls back
transparently to scipy when a compiler is unavailable
(xclim_tpu/io/netcdf.py)."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libncreader.so"
_SRC = _HERE / "ncreader.cpp"

_NC_DTYPES = {1: np.int8, 2: np.dtype("S1"), 3: np.int16, 4: np.int32,
              5: np.float32, 6: np.float64}

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             str(_SRC), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def get_lib():
    """Load (compiling if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.nc3_open.restype = ctypes.c_void_p
    lib.nc3_open.argtypes = [ctypes.c_char_p]
    lib.nc3_error.restype = ctypes.c_char_p
    lib.nc3_error.argtypes = [ctypes.c_void_p]
    lib.nc3_close.argtypes = [ctypes.c_void_p]
    lib.nc3_num_dims.argtypes = [ctypes.c_void_p]
    lib.nc3_dim_name.restype = ctypes.c_char_p
    lib.nc3_dim_name.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.nc3_dim_size.restype = ctypes.c_int64
    lib.nc3_dim_size.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.nc3_num_vars.argtypes = [ctypes.c_void_p]
    lib.nc3_var_name.restype = ctypes.c_char_p
    lib.nc3_var_name.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.nc3_var_type.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.nc3_var_ndims.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.nc3_var_dimid.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
    lib.nc3_var_natts.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.nc3_att_name.restype = ctypes.c_char_p
    lib.nc3_att_name.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
    lib.nc3_att_type.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
    lib.nc3_att_nelems.restype = ctypes.c_int64
    lib.nc3_att_nelems.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
    lib.nc3_att_values.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
                                   ctypes.c_void_p]
    lib.nc3_var_nelems.restype = ctypes.c_int64
    lib.nc3_var_nelems.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.nc3_read_var.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]
    _lib = lib
    return lib


class NativeNC3:
    """Pythonic view over the native reader."""

    def __init__(self, path):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native ncreader unavailable")
        self.lib = lib
        self.h = lib.nc3_open(str(path).encode())
        err = lib.nc3_error(self.h).decode()
        if err:
            lib.nc3_close(self.h)
            raise ValueError(f"ncreader: {err}")
        self.dims = {}
        for i in range(lib.nc3_num_dims(self.h)):
            self.dims[lib.nc3_dim_name(self.h, i).decode()] = lib.nc3_dim_size(self.h, i)
        self._dimnames = list(self.dims)

    def close(self):
        if self.h:
            self.lib.nc3_close(self.h)
            self.h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def _atts(self, vi: int) -> dict:
        out = {}
        for a in range(self.lib.nc3_var_natts(self.h, vi)):
            name = self.lib.nc3_att_name(self.h, vi, a).decode()
            t = self.lib.nc3_att_type(self.h, vi, a)
            n = self.lib.nc3_att_nelems(self.h, vi, a)
            buf = np.empty(n, dtype=_NC_DTYPES[t])
            self.lib.nc3_att_values(self.h, vi, a, buf.ctypes.data_as(ctypes.c_void_p))
            if t == 2:
                out[name] = buf.tobytes().decode("utf-8", "replace")
            elif n == 1:
                out[name] = buf[0].item()
            else:
                out[name] = buf
        return out

    @property
    def global_attrs(self) -> dict:
        return self._atts(-1)

    def variables(self) -> dict:
        """{name: (dims tuple, numpy array, attrs dict)}."""
        out = {}
        for i in range(self.lib.nc3_num_vars(self.h)):
            name = self.lib.nc3_var_name(self.h, i).decode()
            t = self.lib.nc3_var_type(self.h, i)
            nd = self.lib.nc3_var_ndims(self.h, i)
            dims = tuple(self._dimnames[self.lib.nc3_var_dimid(self.h, i, d)]
                         for d in range(nd))
            shape = tuple(self.dims[d] for d in dims)
            n = self.lib.nc3_var_nelems(self.h, i)
            buf = np.empty(n, dtype=_NC_DTYPES[t])
            rc = self.lib.nc3_read_var(self.h, i, buf.ctypes.data_as(ctypes.c_void_p))
            if rc != 0:
                raise ValueError(f"ncreader: failed reading {name} (rc={rc})")
            out[name] = (dims, buf.reshape(shape), self._atts(i))
        return out
