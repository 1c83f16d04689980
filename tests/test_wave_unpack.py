"""Hybrid device decode: control-only native parse + device refinement
distribution/reconstruction must equal the full native decode EXACTLY,
including truncated (progressive) streams."""

import numpy as np
import pytest

import jax.numpy as jnp

from sperr_tpu.ops import packemit as pe
from sperr_tpu.ops import wave_unpack as wu
from sperr_tpu.runtime.engine import default_engine



pytestmark = pytest.mark.slow  # JAX-compile-heavy (see pytest.ini)

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


def test_production_decoder_hybrid_path():
    """TpuDecompressor3D(hybrid=True) must reproduce the full-host-parse
    decoder exactly — container-level, all modes, including the outlier
    add-back and a truncated stream."""
    import numpy as np

    from sperr_tpu.parallel.batched import TpuCompressor3D, TpuDecompressor3D
    from sperr_tpu.stream import tools as st

    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, 32, dtype=np.float32)
    f = (
        np.sin(6 * t)[:, None, None]
        * np.cos(4 * t)[None, :, None]
        * np.sin(5 * t)[None, None, :]
    ).astype(np.float32)
    vol = f + rng.normal(scale=0.002, size=(32, 32, 32)).astype(np.float32)
    for mode, q in [("pwe", 1e-2), ("psnr", 60.0), ("rate", 1.0)]:
        s = bytes(
            TpuCompressor3D((32, 32, 32), (16, 16, 16), entropy="host")
            .compress(vol, mode, q)
        )
        out0, _ = TpuDecompressor3D(hybrid=False).decompress(s)
        dec = TpuDecompressor3D(hybrid=True)
        out1, _ = dec.decompress(s)
        assert (out0 == out1).all()
        assert dec.last_hybrid_chunks == 8
    s = bytes(
        TpuCompressor3D((32, 32, 32), (16, 16, 16), entropy="host")
        .compress(vol, "pwe", 1e-3)
    )
    tr = bytes(st.progressive_truncate(s, 40))
    o0, _ = TpuDecompressor3D(hybrid=False).decompress(tr)
    o1, _ = TpuDecompressor3D(hybrid=True).decompress(tr)
    assert (o0 == o1).all()
