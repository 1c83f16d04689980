"""The 2D device set walk (quad partitions + QccPack I-set, event form)
must be byte-identical to the host sorted emitter at every pass, and the
full 2D device wave tier must produce host-identical containers."""

import jax.numpy as jnp
import numpy as np
import pytest

from sperr_tpu.codec import speck_wave as sw
from sperr_tpu.codec.speck_sorted import lis_segments_sorted_2d
from sperr_tpu.ops import speck_lis2_jax as sl2


pytestmark = pytest.mark.slow  # JAX-compile-heavy (see pytest.ini)

_NEVER = 0x7FFF


def _walk_inputs(nx, ny, mags, signs):
    tree = sw.build_tree2((nx, ny))
    pmsb = sw.msbp1(mags.astype(np.uint64))
    num_bp = int(pmsb.max())
    nm = sw.compute_node_max(tree, pmsb)
    node_s = np.where(nm > 0, num_bp - nm, _NEVER).astype(np.int32)
    s_lin = np.where(pmsb > 0, num_bp - pmsb, _NEVER).astype(np.int32)
    iset_max = sw._iset_maxes(tree, pmsb.reshape(ny, nx))
    iset_s = np.where(iset_max > 0, num_bp - iset_max, _NEVER).astype(np.int32)
    return tree, pmsb, num_bp, node_s, s_lin, iset_s


def _assert_walk_matches(nx, ny, mags, signs):
    n = nx * ny
    tree, pmsb, num_bp, node_s, s_lin, iset_s = _walk_inputs(
        nx, ny, mags, signs
    )
    if num_bp == 0:
        pytest.skip("empty field")
    host = lis_segments_sorted_2d(tree, node_s, s_lin, signs, num_bp, iset_s)
    li2 = sl2.lis2_index((nx, ny))
    dev_iset = np.asarray(
        sl2.iset_significance_device(
            jnp.asarray(pmsb.astype(np.int32).reshape(ny, nx)), tree,
            jnp.int32(num_bp),
        )
    )
    assert (dev_iset == iset_s).all()
    buf, counts, total, _ = sl2.lis2_segments_device(
        jnp.asarray(node_s), jnp.asarray(s_lin), jnp.asarray(signs),
        jnp.int32(num_bp), jnp.asarray(iset_s), li2,
        34, li2.nn, 6 * n + 4096, 2 * n + 64,
    )
    buf = np.asarray(buf)
    counts = np.asarray(counts)
    bc = (counts + 7) // 8
    offs = np.cumsum(bc) - bc
    for p in range(num_bp):
        dev_bits = np.unpackbits(
            buf[offs[p] : offs[p] + bc[p]], bitorder="little"
        )[: counts[p]]
        assert dev_bits.size == host[p].size, f"pass {p} length"
        assert (dev_bits == host[p]).all(), f"pass {p} bits"


@pytest.mark.parametrize("nx,ny", [(32, 32), (64, 48), (33, 57)])
@pytest.mark.parametrize("seed", [0, 1])
def test_walk_matches_host(nx, ny, seed):
    n = nx * ny
    rng = np.random.default_rng(seed)
    mags = (
        rng.integers(0, 1 << 12, size=n) * (rng.random(n) < 0.4)
    ).astype(np.uint64)
    signs = rng.random(n) < 0.5
    _assert_walk_matches(nx, ny, mags, signs)


@pytest.mark.parametrize("density,hi", [(0.02, 1 << 20), (0.95, 1 << 6)])
def test_walk_extreme_densities(density, hi):
    nx = ny = 64
    n = nx * ny
    rng = np.random.default_rng(3)
    mags = (rng.integers(0, hi, size=n) * (rng.random(n) < density)).astype(
        np.uint64
    )
    signs = rng.random(n) < 0.5
    _assert_walk_matches(nx, ny, mags, signs)


@pytest.mark.parametrize("nx,ny", [(64, 64), (33, 57)])
def test_walk_iset_cascades(nx, ny):
    """Energy only in the outermost corner: every I level partitions in a
    cascade with all groups silent (the implied-decision-bit path)."""
    n = nx * ny
    m2d = np.zeros((ny, nx), np.uint64)
    m2d[ny - 1, nx - 1] = 1000
    m2d[0, 0] = 3
    _assert_walk_matches(nx, ny, m2d.reshape(-1), np.ones(n, bool))


@pytest.mark.parametrize("fill", ["s0_only", "flat"])
def test_walk_degenerate(fill):
    nx = ny = 64
    n = nx * ny
    if fill == "s0_only":
        m2d = np.zeros((ny, nx), np.uint64)
        m2d[0, 0] = 1
        mags = m2d.reshape(-1)
    else:
        mags = np.full(n, 5, np.uint64)
    _assert_walk_matches(nx, ny, mags, np.zeros(n, bool))


@pytest.mark.parametrize("nx,ny", [(64, 64), (128, 41)])
def test_wave_tier_container_identical(nx, ny):
    """TpuCompressor2D entropy='wave' (full device walk) containers must be
    byte-identical to entropy='host', in pwe and rate modes."""
    from sperr_tpu.parallel.batched2d import TpuCompressor2D

    rng = np.random.default_rng(5)
    f = (rng.normal(size=(2, ny, nx)) * 0.3).astype(np.float32)
    cw = TpuCompressor2D((nx, ny), entropy="wave")
    ch = TpuCompressor2D((nx, ny), entropy="host")
    for mode, q in (("pwe", 1e-2), ("rate", 1.5)):
        sw_ = cw.compress_batch(f, mode, q)
        sh_ = ch.compress_batch(f, mode, q)
        for a, b in zip(sw_, sh_):
            assert bytes(a) == bytes(b), mode
