"""Pallas kernel validation (interpret mode on CPU; TPU compile in bench)."""

import numpy as np
import pytest

from sperr_tpu.ops import cdf97_np as cdf
from sperr_tpu.ops import pallas_kernels as pk


def _rand(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


@pytest.mark.parametrize("shape", [(3, 64, 64), (2, 48, 80), (1, 127, 127)])
def test_dwt2d_pallas_matches_host(shape):
    x = _rand(shape, seed=shape[1])
    out = np.asarray(pk.dwt2d_pallas(x, interpret=True))
    ref = np.stack([cdf.dwt2d(p.astype(np.float64)) for p in x])
    # f32 kernel vs f64 host: agree to f32 roundoff.
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    back = np.asarray(pk.idwt2d_pallas(out, interpret=True))
    np.testing.assert_allclose(back, x, rtol=2e-5, atol=2e-5)


def test_quantize_pallas_matches_jax():
    from sperr_tpu.ops import quantize_jax as qzj
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    coeffs = rng.normal(scale=100.0, size=(4, 4096)).astype(np.float32)
    q = np.abs(rng.normal(scale=0.5, size=4)).astype(np.float32) + 0.01
    mags, signs, maxmag = pk.quantize_pallas(
        jnp.asarray(coeffs), jnp.asarray(q), interpret=True
    )
    m2, s2, mm2 = qzj.midtread_quantize_batched(jnp.asarray(coeffs), jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(mags), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(signs), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(maxmag), np.asarray(mm2))
