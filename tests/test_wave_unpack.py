"""Hybrid device decode: control-only native parse + device refinement
distribution/reconstruction must equal the full native decode EXACTLY,
including truncated (progressive) streams."""

import numpy as np
import pytest

import jax.numpy as jnp

from sperr_tpu.ops import packemit as pe
from sperr_tpu.ops import wave_unpack as wu
from sperr_tpu.runtime.engine import default_engine


def _np_pdep(x, m):
    out = 0
    k = 0
    for j in range(32):
        if (m >> j) & 1:
            out |= ((x >> k) & 1) << j
            k += 1
    return out


def test_pdep32_random():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**32, 2048, dtype=np.uint64).astype(np.uint32)
    m = rng.integers(0, 2**32, 2048, dtype=np.uint64).astype(np.uint32)
    m[:4] = [0, 0xFFFFFFFF, 1, 0x80000000]
    got = np.asarray(wu.pdep32(jnp.asarray(x), jnp.asarray(m)))
    want = np.asarray(
        [_np_pdep(int(a), int(b)) for a, b in zip(x, m)], dtype=np.uint32
    )
    np.testing.assert_array_equal(got, want)
    # pdep inverts pext on the mask's population
    px = pe.pext32(jnp.asarray(x), jnp.asarray(m))
    back = wu.pdep32(px, jnp.asarray(m))
    np.testing.assert_array_equal(np.asarray(back), x & m)


def _roundtrip(dims, dens, seed, trunc=None, scale=5000):
    eng = default_engine()
    if eng.name != "native":
        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(seed)
    n = dims[0] * dims[1] * dims[2]
    mags = np.where(
        rng.random(n) < dens, rng.integers(0, scale, n), 0
    ).astype(np.uint64)
    signs = rng.random(n) < 0.5
    body = eng.encode(3, mags, signs, dims, 16, 0)
    if trunc is not None:
        body = body[: max(9, int(len(body) * trunc))]
    m_ref, s_ref = eng.decode(3, body, dims, 16)
    spass, sg, roff, ravail, nbp, avail = eng.decode3d_control(
        body, dims, 16
    )
    np.testing.assert_array_equal(sg, s_ref.astype(bool))
    if nbp == 0:
        assert not m_ref.any()
        return
    p_cap = 16 if nbp <= 16 else 34
    pad = np.zeros(p_cap - nbp, np.int64)
    words = np.frombuffer(
        bytes(body[9:]) + b"\0" * ((-len(body) + 9) % 4 + 8), dtype="<u4"
    )
    got, overflow = wu.reconstruct_mags(
        jnp.asarray(spass),
        jnp.asarray(words.astype(np.uint32)),
        jnp.asarray(np.concatenate([roff.astype(np.int64), pad]).astype(np.int32)),
        jnp.asarray(np.concatenate([ravail.astype(np.int64), pad]).astype(np.int32)),
        jnp.int32(nbp),
        p_cap,
        p_cap * ((-(-n // 128) * 128) // 32),
    )
    assert not bool(overflow)
    np.testing.assert_array_equal(
        np.asarray(got).astype(np.uint64), m_ref
    )


@pytest.mark.parametrize("dims,dens,scale", [
    ((32, 32, 32), 0.2, 5000),
    ((16, 16, 16), 0.9, 200000),
    ((31, 17, 9), 0.5, 60),
    ((64, 64, 64), 0.02, 5000),
])
def test_reconstruct_matches_full_decode(dims, dens, scale):
    _roundtrip(dims, dens, seed=3, scale=scale)


@pytest.mark.parametrize("trunc", [0.85, 0.5, 0.2, 0.06])
def test_reconstruct_truncated_streams(trunc):
    _roundtrip((32, 32, 32), 0.25, seed=9, trunc=trunc)


def test_reconstruct_zero_field():
    _roundtrip((16, 16, 16), 0.0, seed=1)
