"""Seeded cross-engine fuzz: random shapes/densities/widths/budgets must be
byte-identical across the NumPy, native C++, and wavefront engines, and
truncated decodes must agree.  A 145-trial soak with wider ranges ran clean
during development; this seeded subset guards regressions cheaply."""

import numpy as np
import pytest

from sperr_tpu.codec.speck_flt import SpeckFloatCodec
from sperr_tpu.runtime.engine import NumpyEngine, WaveEngine, default_engine


pytestmark = pytest.mark.slow  # JAX-compile-heavy (see pytest.ini)

ENG = default_engine()
NPY = NumpyEngine()
WAV = WaveEngine()


def _dims(rng):
    ndim = int(rng.integers(1, 4))
    if ndim == 1:
        return ndim, (int(rng.integers(1, 300)), 1, 1)
    if ndim == 2:
        return ndim, (int(rng.integers(1, 48)), int(rng.integers(1, 48)), 1)
    return ndim, tuple(int(x) for x in rng.integers(1, 20, 3))


@pytest.mark.parametrize("seed", range(30))
def test_int_coder_cross_engine(seed):
    rng = np.random.default_rng(1000 + seed)
    ndim, dims = _dims(rng)
    n = int(np.prod(dims))
    mags = np.zeros(n, dtype=np.uint64)
    k = max(1, int(n * float(rng.uniform(0.01, 0.9))))
    hi = int(rng.choice([3, 200, 60000, 1 << 20, 1 << 40]))
    mags[rng.choice(n, k, replace=False)] = rng.integers(1, hi, size=k)
    signs = rng.random(n) > 0.5
    budget = int(rng.choice([0, max(32, n // 3)]))
    a = bytes(ENG.encode(ndim, mags, signs, dims, 64, budget))
    assert bytes(NPY.encode(ndim, mags, signs, dims, 64, budget)) == a
    assert bytes(WAV.encode(ndim, mags, signs, dims, 64, budget)) == a
    ln = max(10, int(len(a) * float(rng.uniform(0.05, 1.0))))
    m1, s1 = ENG.decode(ndim, a[:ln], dims, 64)
    m2, s2 = WAV.decode(ndim, a[:ln], dims, 64)
    np.testing.assert_array_equal(m1.astype(np.uint64), m2)
    np.testing.assert_array_equal(s1, s2)


@pytest.mark.parametrize("seed", range(8))
def test_float_pipeline_cross_engine(seed):
    rng = np.random.default_rng(2000 + seed)
    ndim = int(rng.integers(2, 4))
    if ndim == 2:
        dims = (int(rng.integers(4, 48)), int(rng.integers(4, 48)), 1)
    else:
        dims = tuple(int(x) for x in rng.integers(4, 20, 3))
    n = int(np.prod(dims))
    data = np.cumsum(rng.normal(size=n)).astype(np.float64)
    mode = ("pwe", "psnr", "rate", "directq")[seed % 4]
    q = {
        "pwe": float(np.abs(data).max() * 1e-3 + 1e-12),
        "psnr": 70.0,
        "rate": 2.0,
        "directq": float(np.abs(data).max() * 1e-3 + 1e-12),
    }[mode]
    ref = bytes(SpeckFloatCodec(ndim, dims, engine=ENG).compress(data.copy(), mode, q))
    assert bytes(
        SpeckFloatCodec(ndim, dims, engine=WAV).compress(data.copy(), mode, q)
    ) == ref
    out, _ = SpeckFloatCodec(ndim, dims).decompress(ref)
    if mode == "pwe":
        assert np.abs(out - data).max() <= q * 1.0001
