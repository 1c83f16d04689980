"""Flat C ABI (runtime/native/capi.cpp): byte-parity with the Python capi
module and the reference oracle (mirrors examples/C_API/test.sh, the
reference's own cross-API bit-exactness harness)."""

import ctypes as ct

import numpy as np
import pytest

from sperr_tpu import capi as pycapi
from sperr_tpu.runtime.native import load_capi
from sperr_tpu.stream import tools

LIB = load_capi()


def _free(ptr):
    ct.CDLL(None).free(ptr)


def _comp_3d(vol, dims, chunks, mode, quality, nthreads=2):
    dst = ct.c_void_p(None)
    dst_len = ct.c_size_t(0)
    arr = np.ascontiguousarray(vol, dtype=np.float32)
    rtn = LIB.sperr_comp_3d(
        arr.ctypes.data_as(ct.c_void_p), 1, *dims, *chunks, mode, quality,
        nthreads, ct.byref(dst), ct.byref(dst_len),
    )
    assert rtn == 0
    out = ct.string_at(dst, dst_len.value)
    _free(dst)
    return out


def _decomp_3d(stream, nthreads=2):
    dst = ct.c_void_p(None)
    dx, dy, dz = ct.c_size_t(0), ct.c_size_t(0), ct.c_size_t(0)
    rtn = LIB.sperr_decomp_3d(
        stream, len(stream), 0, nthreads, ct.byref(dx), ct.byref(dy),
        ct.byref(dz), ct.byref(dst),
    )
    assert rtn == 0
    n = dx.value * dy.value * dz.value
    out = np.ctypeslib.as_array(ct.cast(dst, ct.POINTER(ct.c_double)), (n,)).copy()
    _free(dst)
    return out, (dx.value, dy.value, dz.value)


@pytest.fixture(scope="module")
def vol():
    return np.fromfile(
        "/root/reference/test_data/vorticity.128_128_41", dtype=np.float32
    )


@pytest.mark.parametrize("mode,quality", [(3, 1e-6), (2, 85.0), (1, 2.0)])
def test_comp_3d_matches_python_capi(vol, mode, quality):
    native = _comp_3d(vol, (128, 128, 41), (64, 64, 64), mode, quality)
    python = bytes(
        pycapi.comp_3d(vol, 128, 128, 41, 64, 64, 64, mode=mode,
                       quality=quality)
    )
    assert native == python


def test_comp_3d_matches_reference_oracle(vol):
    from tests import oracle

    native = _comp_3d(vol, (128, 128, 41), (64, 64, 64), 3, 1e-6)
    ref = bytes(oracle.comp_3d(vol, (128, 128, 41), (64, 64, 64), "pwe", 1e-6))
    assert native == ref


def test_decomp_3d_roundtrip(vol):
    stream = _comp_3d(vol, (128, 128, 41), (64, 64, 64), 3, 1e-6)
    out, dims = _decomp_3d(stream)
    assert dims == (128, 128, 41)
    assert np.abs(out - vol.astype(np.float64)).max() <= 1e-6 * 1.01


def test_parse_header(vol):
    stream = _comp_3d(vol, (128, 128, 41), (64, 64, 64), 3, 1e-4)
    dx, dy, dz = ct.c_size_t(0), ct.c_size_t(0), ct.c_size_t(0)
    isf = ct.c_int(-1)
    LIB.sperr_parse_header(stream, ct.byref(dx), ct.byref(dy), ct.byref(dz),
                           ct.byref(isf))
    assert (dx.value, dy.value, dz.value, isf.value) == (128, 128, 41, 1)


def test_trunc_3d_matches_python_tools(vol):
    stream = _comp_3d(vol, (128, 128, 41), (64, 64, 64), 1, 2.0)
    for pct in (10, 45, 100):
        dst = ct.c_void_p(None)
        dst_len = ct.c_size_t(0)
        rtn = LIB.sperr_trunc_3d(stream, len(stream), pct, ct.byref(dst),
                                 ct.byref(dst_len))
        assert rtn == 0
        got = ct.string_at(dst, dst_len.value)
        _free(dst)
        want = tools.progressive_truncate(stream, pct)
        assert got == want
        if pct < 100:
            assert got[1] == stream[1] + 128  # portion bit (reference test)


def test_comp_2d_matches_python_and_decomp(tmp_path):
    data = np.fromfile(
        "/root/reference/test_data/vorticity.512_512", dtype=np.float32
    )[: 256 * 256]
    dst = ct.c_void_p(None)
    dst_len = ct.c_size_t(0)
    rtn = LIB.sperr_comp_2d(
        np.ascontiguousarray(data).ctypes.data_as(ct.c_void_p), 1, 256, 256,
        3, 1e-7, 1, ct.byref(dst), ct.byref(dst_len),
    )
    assert rtn == 0
    native = ct.string_at(dst, dst_len.value)
    _free(dst)
    python = bytes(
        pycapi.comp_2d(data, 256, 256, mode=3, quality=1e-7, out_inc_header=True)
    )
    assert native == python
    # decode the headerless portion
    dst2 = ct.c_void_p(None)
    rtn = LIB.sperr_decomp_2d(native[10:], len(native) - 10, 0, 256, 256,
                              ct.byref(dst2))
    assert rtn == 0
    out = np.ctypeslib.as_array(
        ct.cast(dst2, ct.POINTER(ct.c_double)), (256 * 256,)
    ).copy()
    _free(dst2)
    assert np.abs(out - data.astype(np.float64)).max() <= 1e-7 * 1.01


def test_header_compiles_against_lib(tmp_path):
    """The shipped sperr_capi.h declares exactly the exported ABI."""
    import subprocess

    from sperr_tpu.runtime.native import _DIR, capi_lib_path

    lib = capi_lib_path()
    cfile = tmp_path / "use.c"
    cfile.write_text(
        '#include "sperr_capi.h"\n'
        "int main(void) {\n"
        "  void* d = 0; size_t n = 0, x, y, z; int f;\n"
        "  (void)sperr_parse_header; (void)sperr_comp_2d; (void)sperr_decomp_2d;\n"
        "  (void)sperr_comp_3d; (void)sperr_decomp_3d; (void)sperr_trunc_3d;\n"
        "  (void)d; (void)n; (void)x; (void)y; (void)z; (void)f;\n"
        "  return 0;\n}\n"
    )
    exe = tmp_path / "use"
    subprocess.run(
        ["gcc", str(cfile), f"-I{_DIR}", lib, "-o", str(exe)],
        check=True, capture_output=True,
    )
    subprocess.run([str(exe)], check=True)


def test_thread_count_equivalence(vol):
    """Containers are byte-equal regardless of worker count (reference
    sperr3d_omp_unit_test thread-count contract)."""
    base = _comp_3d(vol, (128, 128, 41), (64, 64, 41), 3, 1e-5, nthreads=1)
    for nt in (2, 4, 0):
        assert _comp_3d(vol, (128, 128, 41), (64, 64, 41), 3, 1e-5, nthreads=nt) == base
    out1, _ = _decomp_3d(base, nthreads=1)
    out4, _ = _decomp_3d(base, nthreads=4)
    np.testing.assert_array_equal(out1, out4)


def test_dst_not_null_rejected(vol):
    bogus = ct.c_void_p(1234)
    dst_len = ct.c_size_t(0)
    rtn = LIB.sperr_comp_3d(
        np.ascontiguousarray(vol).ctypes.data_as(ct.c_void_p), 1, 128, 128, 41,
        64, 64, 64, 3, 1e-4, 1, ct.byref(bogus), ct.byref(dst_len),
    )
    assert rtn == 1
