"""Native C++ engine must produce byte-identical streams to the NumPy engine."""

import numpy as np
import pytest

from sperr_tpu.codec import speck_int_np as sp
from sperr_tpu.runtime.engine import NumpyEngine

native = pytest.importorskip("sperr_tpu.runtime.native")



pytestmark = pytest.mark.slow  # JAX-compile-heavy (see pytest.ini)

@pytest.fixture(scope="module")
def eng():
    return native.NativeEngine()


def _case(n, width, seed, zeros_frac=0.0):
    rng = np.random.default_rng(seed)
    vals = rng.normal(0, 2 ** (width / 2.2), n)
    if zeros_frac:
        vals[rng.random(n) < zeros_frac] = 0.0
    mags = np.minimum(np.abs(vals), float(2**width - 1)).astype(np.uint64)
    signs = vals >= 0
    return mags, signs


@pytest.mark.parametrize("width", [8, 16, 32, 64])
@pytest.mark.parametrize(
    "ndim,dims",
    [
        (1, (501, 1, 1)),
        (2, (33, 29, 1)),
        (2, (64, 64, 1)),
        (3, (16, 16, 16)),
        (3, (13, 25, 9)),
        (3, (36, 36, 9)),  # wavelet-packet geometry
    ],
)
def test_stream_equality(eng, ndim, dims, width):
    ref = NumpyEngine()
    n = int(np.prod(dims))
    for seed, zf in [(0, 0.0), (1, 0.7), (2, 0.98)]:
        mags, signs = _case(n, width, seed, zf)
        s_np = ref.encode(ndim, mags, signs, dims, width, 0)
        s_nat = eng.encode(ndim, mags, signs, dims, width, 0)
        assert s_nat == s_np, f"dims={dims} w={width} seed={seed}"

        m1, g1 = eng.decode(ndim, s_nat, dims, width)
        np.testing.assert_array_equal(m1, mags)
        nz = mags != 0
        np.testing.assert_array_equal(g1[nz], signs[nz])


@pytest.mark.parametrize("budget_bpp", [0.5, 2.0])
def test_budget_equality(eng, budget_bpp):
    dims = (32, 32, 32)
    n = int(np.prod(dims))
    mags, signs = _case(n, 32, 5)
    budget = int(budget_bpp * n)
    s_np = NumpyEngine().encode(3, mags, signs, dims, 32, budget)
    s_nat = eng.encode(3, mags, signs, dims, 32, budget)
    assert s_nat == s_np

    # Truncated decode parity between engines.
    m1, g1 = eng.decode(3, s_nat, dims, 32)
    m2, g2 = NumpyEngine().decode(3, s_np, dims, 32)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(g1, g2)


def test_progressive_prefix_equality(eng):
    dims = (24, 24, 1)
    n = int(np.prod(dims))
    mags, signs = _case(n, 16, 7)
    full = eng.encode(2, mags, signs, dims, 16, 0)
    for frac in (0.3, 0.6):
        cut = sp.HEADER_SIZE + int((len(full) - sp.HEADER_SIZE) * frac)
        m1, g1 = eng.decode(2, full[:cut], dims, 16)
        m2, g2 = NumpyEngine().decode(2, full[:cut], dims, 16)
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(g1, g2)


def test_all_zero(eng):
    dims = (8, 8, 8)
    n = 512
    s = eng.encode(3, np.zeros(n, np.uint64), np.ones(n, bool), dims, 8, 0)
    assert len(s) == 9 and s[0] == 0
    m, g = eng.decode(3, s, dims, 8)
    assert not m.any()
