"""ctypes bindings to the reference SPERR library, used as a parity oracle.

The reference sources are compiled out-of-tree (in /tmp) with
-ffp-contract=off so its floating-point arithmetic matches IEEE op-by-op
evaluation, which is what our engines produce.  Tests byte-compare our
streams against this oracle.  If the library cannot be built, parity tests
are skipped.
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess

import numpy as np

_LIB_PATH = "/tmp/ref_oracle/libsperr_ref.so"
_REF = "/root/reference"


def _build() -> bool:
    os.makedirs("/tmp/ref_oracle", exist_ok=True)
    cfg = "/tmp/ref_oracle/SperrConfig.h"
    if not os.path.exists(cfg):
        with open(cfg, "w") as f:
            f.write(
                "#pragma once\n#define SPERR_VERSION_MAJOR 0\n"
                "#define SPERR_VERSION_MINOR 8\n#define SPERR_VERSION_PATCH 5\n"
                '#define SPERR_GIT_SHA1 "oracle"\n'
            )
    import glob

    srcs = sorted(glob.glob(f"{_REF}/src/*.cpp"))
    cmd = [
        "g++", "-O2", "-std=c++20", "-DNDEBUG", "-ffp-contract=off", "-shared", "-fPIC",
        f"-I{_REF}/include", "-I/tmp/ref_oracle", *srcs, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=600)
        return True
    except Exception:
        return False


_lib = None


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ct.CDLL(_LIB_PATH)
    lib.sperr_comp_2d.restype = ct.c_int
    lib.sperr_comp_3d.restype = ct.c_int
    lib.sperr_decomp_2d.restype = ct.c_int
    lib.sperr_decomp_3d.restype = ct.c_int
    lib.sperr_trunc_3d.restype = ct.c_int
    _lib = lib
    return lib


_MODE = {"rate": 1, "psnr": 2, "pwe": 3}


def comp_2d(data: np.ndarray, dims, mode: str, quality: float, header: bool = False) -> bytes:
    """data: flat float64/float32 array, x fastest; dims = (nx, ny)."""
    lib = get_lib()
    is_float = 1 if data.dtype == np.float32 else 0
    dst = ct.c_void_p(None)
    dst_len = ct.c_size_t(0)
    rtn = lib.sperr_comp_2d(
        data.ctypes.data_as(ct.c_void_p), is_float,
        ct.c_size_t(dims[0]), ct.c_size_t(dims[1]),
        _MODE[mode], ct.c_double(quality), 1 if header else 0,
        ct.byref(dst), ct.byref(dst_len),
    )
    assert rtn == 0, f"oracle comp_2d failed: {rtn}"
    out = ct.string_at(dst, dst_len.value)
    _libc_free(dst)
    return out


def decomp_2d(stream: bytes, dims, want_float: bool = False) -> np.ndarray:
    lib = get_lib()
    dst = ct.c_void_p(None)
    rtn = lib.sperr_decomp_2d(
        stream, ct.c_size_t(len(stream)), 1 if want_float else 0,
        ct.c_size_t(dims[0]), ct.c_size_t(dims[1]), ct.byref(dst),
    )
    assert rtn == 0, f"oracle decomp_2d failed: {rtn}"
    n = dims[0] * dims[1]
    dtype = np.float32 if want_float else np.float64
    out = np.frombuffer(
        ct.string_at(dst, n * np.dtype(dtype).itemsize), dtype=dtype
    ).copy()
    _libc_free(dst)
    return out


def comp_3d(
    data: np.ndarray, dims, chunks, mode: str, quality: float, nthreads: int = 1
) -> bytes:
    lib = get_lib()
    is_float = 1 if data.dtype == np.float32 else 0
    dst = ct.c_void_p(None)
    dst_len = ct.c_size_t(0)
    rtn = lib.sperr_comp_3d(
        data.ctypes.data_as(ct.c_void_p), is_float,
        ct.c_size_t(dims[0]), ct.c_size_t(dims[1]), ct.c_size_t(dims[2]),
        ct.c_size_t(chunks[0]), ct.c_size_t(chunks[1]), ct.c_size_t(chunks[2]),
        _MODE[mode], ct.c_double(quality), ct.c_size_t(nthreads),
        ct.byref(dst), ct.byref(dst_len),
    )
    assert rtn == 0, f"oracle comp_3d failed: {rtn}"
    out = ct.string_at(dst, dst_len.value)
    _libc_free(dst)
    return out


def decomp_3d(stream: bytes, want_float: bool = False, nthreads: int = 1):
    lib = get_lib()
    dst = ct.c_void_p(None)
    dx, dy, dz = ct.c_size_t(0), ct.c_size_t(0), ct.c_size_t(0)
    rtn = lib.sperr_decomp_3d(
        stream, ct.c_size_t(len(stream)), 1 if want_float else 0,
        ct.c_size_t(nthreads),
        ct.byref(dx), ct.byref(dy), ct.byref(dz), ct.byref(dst),
    )
    assert rtn == 0, f"oracle decomp_3d failed: {rtn}"
    n = dx.value * dy.value * dz.value
    dtype = np.float32 if want_float else np.float64
    out = np.frombuffer(
        ct.string_at(dst, n * np.dtype(dtype).itemsize), dtype=dtype
    ).copy()
    _libc_free(dst)
    return out, (dx.value, dy.value, dz.value)


def trunc_3d(stream: bytes, pct: int) -> bytes:
    lib = get_lib()
    dst = ct.c_void_p(None)
    dst_len = ct.c_size_t(0)
    rtn = lib.sperr_trunc_3d(
        stream, ct.c_size_t(len(stream)), ct.c_uint(pct), ct.byref(dst), ct.byref(dst_len)
    )
    assert rtn == 0, f"oracle trunc_3d failed: {rtn}"
    out = ct.string_at(dst, dst_len.value)
    _libc_free(dst)
    return out


_libc = ct.CDLL(None)
_libc.free.argtypes = [ct.c_void_p]


def _libc_free(p: ct.c_void_p) -> None:
    _libc.free(p)
