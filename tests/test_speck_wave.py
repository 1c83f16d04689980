"""Wavefront SPECK engine: byte-parity against the serial engines.

The wavefront engine (codec/speck_wave.py) re-architects the reference's
bit-serial LIS recursion (reference src/SPECK_INT.cpp:111-228) as vectorized
per-bitplane passes; these tests pin byte-equality of its streams and decode
results to the serial engine across shapes, densities, widths, budgets, and
truncation points (mirroring test_scripts/speck_int_unit_test.cpp's lossless
roundtrip contract)."""

import numpy as np
import pytest

from sperr_tpu.codec import speck_wave as sw
from sperr_tpu.runtime.engine import NumpyEngine, WaveEngine, default_engine


pytestmark = pytest.mark.slow  # JAX-compile-heavy (see pytest.ini)

ENG = default_engine()

SHAPES = [
    (8, 8, 8),
    (16, 16, 16),
    (7, 5, 3),
    (9, 9, 9),
    (32, 32, 32),
    (64, 64, 21),  # wavelet-packet (non-dyadic) init
    (2, 2, 2),
    (1, 1, 8),
    (13, 1, 1),
    (5, 1, 7),
]


def _random_case(rng, n, density):
    mags = np.zeros(n, dtype=np.uint64)
    k = max(1, int(n * density))
    idx = rng.choice(n, size=k, replace=False)
    mags[idx] = rng.integers(1, 1 << 17, size=k).astype(np.uint64)
    signs = rng.random(n) > 0.5
    return mags, signs


@pytest.mark.parametrize("dims", SHAPES)
def test_encode_byte_parity(dims):
    rng = np.random.default_rng(hash(dims) % (2**32))
    n = int(np.prod(dims))
    for density in (0.02, 0.5):
        mags, signs = _random_case(rng, n, density)
        ref = bytes(ENG.encode(3, mags, signs, dims, 64, 0))
        got = bytes(sw.encode_3d(mags, signs, dims, 0))
        assert got == ref


@pytest.mark.parametrize("dims", [(16, 16, 16), (7, 5, 3), (64, 64, 21)])
def test_encode_budget_parity(dims):
    rng = np.random.default_rng(7)
    n = int(np.prod(dims))
    mags, signs = _random_case(rng, n, 0.6)
    for budget in (64, n // 2, n, 2 * n):
        ref = bytes(ENG.encode(3, mags, signs, dims, 64, budget))
        got = bytes(sw.encode_3d(mags, signs, dims, budget))
        assert got == ref


def test_encode_zero_field():
    dims = (8, 8, 8)
    mags = np.zeros(512, dtype=np.uint64)
    signs = np.ones(512, dtype=bool)
    assert bytes(sw.encode_3d(mags, signs, dims, 0)) == bytes(
        ENG.encode(3, mags, signs, dims, 64, 0)
    )


@pytest.mark.parametrize("dims", SHAPES)
def test_decode_lossless_roundtrip(dims):
    rng = np.random.default_rng(hash(dims) % (2**31))
    n = int(np.prod(dims))
    mags, signs = _random_case(rng, n, 0.1)
    stream = bytes(sw.encode_3d(mags, signs, dims, 0))
    m, s = sw.decode_3d(stream, dims)
    np.testing.assert_array_equal(m, mags)
    # signs only meaningful where mags nonzero
    nz = mags > 0
    np.testing.assert_array_equal(s[nz], signs[nz])


@pytest.mark.parametrize("dims", [(16, 16, 16), (7, 5, 3), (64, 64, 21)])
def test_decode_truncated_parity(dims):
    """Any stream prefix decodes identically to the serial decoder
    (progressive access; SPECK_INT.cpp:91-107, 200-227)."""
    rng = np.random.default_rng(11)
    n = int(np.prod(dims))
    mags, signs = _random_case(rng, n, 0.3)
    stream = bytes(ENG.encode(3, mags, signs, dims, 64, 0))
    for frac in (0.05, 0.2, 0.5, 0.8, 1.0):
        ln = max(10, int(len(stream) * frac))
        m1, s1 = ENG.decode(3, stream[:ln], dims, 64)
        m2, s2 = sw.decode_3d(stream[:ln], dims)
        np.testing.assert_array_equal(m1.astype(np.uint64), m2)
        np.testing.assert_array_equal(s1, s2)


def test_wave_engine_wrapper():
    eng = WaveEngine()
    rng = np.random.default_rng(3)
    dims = (12, 10, 8)
    n = int(np.prod(dims))
    mags, signs = _random_case(rng, n, 0.2)
    ref = bytes(NumpyEngine().encode(3, mags, signs, dims, 64, 0))
    assert bytes(eng.encode(3, mags, signs, dims, 64, 0)) == ref
    m, s = eng.decode(3, ref, dims, 64)
    np.testing.assert_array_equal(m, mags)
    # 1D path falls back to the serial engine
    m1 = np.array([5, 0, 3, 0, 0, 0, 9, 1], dtype=np.uint64)
    s1 = np.array([1, 1, 0, 1, 1, 1, 0, 1], dtype=bool)
    assert bytes(eng.encode_1d(m1, s1, 8, 8)) == bytes(
        NumpyEngine().encode_1d(m1, s1, 8, 8)
    )


def test_tree_cached():
    t1 = sw.build_tree((16, 16, 16))
    t2 = sw.build_tree((16, 16, 16))
    assert t1 is t2


# ---------------------------------------------------------------------------
# 2D variant (quad partitions + I-set; SPECK2D_INT.cpp:11-218)
# ---------------------------------------------------------------------------
SHAPES2D = [
    (8, 8),
    (16, 16),
    (7, 5),
    (33, 17),
    (64, 21),
    (1, 9),
    (512, 1),
    (2, 2),
]


@pytest.mark.parametrize("dims", SHAPES2D)
def test_encode_2d_byte_parity(dims):
    rng = np.random.default_rng(hash(dims) % (2**32))
    n = int(np.prod(dims))
    for density in (0.05, 0.5):
        mags, signs = _random_case(rng, n, density)
        ref = bytes(ENG.encode(2, mags, signs, (dims[0], dims[1], 1), 64, 0))
        got = bytes(sw.encode_2d(mags, signs, dims, 0))
        assert got == ref


@pytest.mark.parametrize("dims", [(16, 16), (33, 17), (64, 21)])
def test_decode_2d_truncated_parity(dims):
    rng = np.random.default_rng(13)
    n = int(np.prod(dims))
    mags, signs = _random_case(rng, n, 0.3)
    stream = bytes(ENG.encode(2, mags, signs, (dims[0], dims[1], 1), 64, 0))
    for frac in (0.1, 0.4, 0.8, 1.0):
        ln = max(10, int(len(stream) * frac))
        m1, s1 = ENG.decode(2, stream[:ln], (dims[0], dims[1], 1), 64)
        m2, s2 = sw.decode_2d(stream[:ln], dims)
        np.testing.assert_array_equal(m1.astype(np.uint64), m2)
        np.testing.assert_array_equal(s1, s2)


def test_encode_2d_budget_parity():
    dims = (32, 32)
    rng = np.random.default_rng(17)
    mags, signs = _random_case(rng, 1024, 0.6)
    for budget in (64, 512, 4096):
        assert bytes(sw.encode_2d(mags, signs, dims, budget)) == bytes(
            ENG.encode(2, mags, signs, (32, 32, 1), 64, budget)
        )


# ---------------------------------------------------------------------------
# 1D variant (binary interval partitions; SPECK1D_INT*.cpp)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("n", [1, 2, 3, 8, 13, 64, 1000, 4096])
def test_encode_1d_byte_parity(n):
    rng = np.random.default_rng(n)
    for density in (0.05, 0.5):
        mags, signs = _random_case(rng, n, density)
        ref = bytes(ENG.encode(1, mags, signs, (n, 1, 1), 64, 0))
        got = bytes(sw.encode_1d(mags, signs, n, 0))
        assert got == ref


@pytest.mark.parametrize("n", [13, 1000, 4096])
def test_decode_1d_truncated_parity(n):
    rng = np.random.default_rng(n + 1)
    mags, signs = _random_case(rng, n, 0.3)
    stream = bytes(ENG.encode(1, mags, signs, (n, 1, 1), 64, 0))
    for frac in (0.1, 0.5, 1.0):
        ln = max(10, int(len(stream) * frac))
        m1, s1 = ENG.decode(1, stream[:ln], (n, 1, 1), 64)
        m2, s2 = sw.decode_1d(stream[:ln], n)
        np.testing.assert_array_equal(m1.astype(np.uint64), m2)
        np.testing.assert_array_equal(s1, s2)


def test_1d_outlier_coder_with_wave_engine():
    """The outlier corrector runs on the 1D coder; the wave engine must
    interoperate byte-for-byte."""
    from sperr_tpu.codec import outlier as om
    from sperr_tpu.runtime import engine as eng_mod

    rng = np.random.default_rng(5)
    total = 5000
    pos = np.sort(rng.choice(total, 40, replace=False))
    errs = rng.normal(scale=3e-3, size=40)
    tol = 1e-3
    wave = eng_mod.WaveEngine()
    ref = bytes(om.encode_outliers(pos, errs, total, tol))
    p1, c1 = om.decode_outliers(ref, total, tol)
    got = bytes(om.encode_outliers(pos, errs, total, tol, engine=wave))
    p2, c2 = om.decode_outliers(got, total, tol, engine=wave)
    assert got == ref
    np.testing.assert_array_equal(p2, p1)
    np.testing.assert_array_equal(c2, c1)


def test_wave_engine_2d_path():
    eng = WaveEngine()
    rng = np.random.default_rng(23)
    mags, signs = _random_case(rng, 15 * 11, 0.2)
    ref = bytes(NumpyEngine().encode(2, mags, signs, (15, 11, 1), 64, 0))
    assert bytes(eng.encode(2, mags, signs, (15, 11, 1), 64, 0)) == ref
    m, _ = eng.decode(2, ref, (15, 11, 1), 64)
    np.testing.assert_array_equal(m, mags)
