"""ctypes bindings for the native host runtime (csrc/chipmunk_host.cpp).

Builds on demand with g++ (no pybind11 needed); all entry points degrade to
numpy fallbacks when the toolchain or .so is unavailable, so the framework
never hard-depends on the native layer.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'csrc',
    'chipmunk_host.cpp')
_SO = os.path.join(os.path.dirname(_SRC), 'libchipmunk_host.so')


def _build() -> Optional[str]:
    if os.path.exists(_SO) and (os.path.getmtime(_SO)
                                >= os.path.getmtime(_SRC)):
        return _SO
    try:
        subprocess.run(
            ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-pthread',
             '-std=c++17', _SRC, '-o', _SO],
            check=True, capture_output=True)
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.chipmunk_host_alloc.restype = ctypes.c_int64
        lib.chipmunk_host_alloc.argtypes = [ctypes.c_uint64]
        lib.chipmunk_host_ptr.restype = ctypes.c_void_p
        lib.chipmunk_host_ptr.argtypes = [ctypes.c_int64]
        lib.chipmunk_memcpy.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_uint64]
        lib.chipmunk_bitpack.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_uint64]
        lib.chipmunk_bitunpack.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                           ctypes.c_uint64]
        for fn in ('chipmunk_quantize_fp8_rows', 'chipmunk_quantize_int8_rows',
                   'chipmunk_quantize_int4_rows'):
            getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_void_p, ctypes.c_uint64,
                                         ctypes.c_uint64]
        _LIB = lib
        return _LIB


class HostBuffer:
    """Page-aligned, pre-faulted host staging buffer (the analogue of one
    pinned slot in the reference's pool, offloaded_tensor.py:42-71)."""

    def __init__(self, nbytes: int):
        lib = get_lib()
        self.nbytes = nbytes
        if lib is None:
            self._np = np.zeros(nbytes, np.uint8)
            self._id = None
        else:
            self._id = lib.chipmunk_host_alloc(nbytes)
            ptr = lib.chipmunk_host_ptr(self._id)
            self._np = np.ctypeslib.as_array(
                ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8)),
                shape=(nbytes,))

    def view(self, dtype, shape) -> np.ndarray:
        n = int(np.prod(shape)) * np.dtype(dtype).itemsize
        assert n <= self.nbytes
        return self._np[:n].view(dtype).reshape(shape)

    def write(self, arr: np.ndarray) -> None:
        src = np.ascontiguousarray(arr)
        lib = get_lib()
        dst = self.view(src.dtype, src.shape)
        if lib is None:
            np.copyto(dst, src)
        else:
            lib.chipmunk_memcpy(dst.ctypes.data, src.ctypes.data, src.nbytes)


def quantize_rows_native(w: np.ndarray, kind: str):
    """Multithreaded row-wise weight quantization (csrc quantizers): w is
    [rows, cols] float32; returns (q, scale[rows]) matching the numpy path
    of utils/quant.quantize_host bit-exactly, or None if the native lib is
    unavailable.  This is the hot loop of real-checkpoint loads (~12GB of
    FLUX weights; single-threaded numpy dominates load time otherwise)."""
    lib = get_lib()
    if lib is None or w.ndim != 2:
        return None
    w = np.ascontiguousarray(w, np.float32)
    rows, cols = w.shape
    scale = np.empty((rows,), np.float32)
    if kind == 'fp8':
        import ml_dtypes
        q = np.empty((rows, cols), np.uint8)
        lib.chipmunk_quantize_fp8_rows(w.ctypes.data, q.ctypes.data,
                                       scale.ctypes.data, rows, cols)
        q = q.view(ml_dtypes.float8_e4m3fn)
    elif kind == 'int8':
        q = np.empty((rows, cols), np.int8)
        lib.chipmunk_quantize_int8_rows(w.ctypes.data, q.ctypes.data,
                                        scale.ctypes.data, rows, cols)
    elif kind == 'int4':
        if cols % 2:
            return None
        q = np.empty((rows, cols // 2), np.uint8)
        lib.chipmunk_quantize_int4_rows(w.ctypes.data, q.ctypes.data,
                                        scale.ctypes.data, rows, cols)
    else:
        return None
    return q, scale


def bitpack_host(mask: np.ndarray) -> np.ndarray:
    """Host-side 8x bool-mask compression (reference ops/bitpack.py, but on
    CPU at memory bandwidth for offloaded masks)."""
    flat = np.ascontiguousarray(mask.reshape(-1).astype(np.uint8))
    out = np.empty((len(flat) + 7) // 8, np.uint8)
    lib = get_lib()
    if lib is None:
        return np.packbits(flat, bitorder='little')
    lib.chipmunk_bitpack(flat.ctypes.data, out.ctypes.data, flat.size)
    return out


def bitunpack_host(packed: np.ndarray, shape) -> np.ndarray:
    n = int(np.prod(shape))
    lib = get_lib()
    if lib is None:
        return np.unpackbits(packed, count=n,
                             bitorder='little').astype(bool).reshape(shape)
    out = np.empty(n, np.uint8)
    lib.chipmunk_bitunpack(np.ascontiguousarray(packed).ctypes.data,
                           out.ctypes.data, n)
    return out.astype(bool).reshape(shape)
