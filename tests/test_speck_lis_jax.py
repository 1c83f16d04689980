"""Device-side LIS emission (ops/speck_lis_jax.py): per-pass packed LIS
segments from on-device sorts must be bit-identical to the host sorted
emission (codec/speck_sorted.py), which is itself pinned to the recursive
walk and the serial engines."""

import numpy as np
import pytest

import jax.numpy as jnp

from sperr_tpu.codec import speck_sorted as ss
from sperr_tpu.codec import speck_wave as sw
from sperr_tpu.ops import speck_lis_jax as sl


pytestmark = pytest.mark.slow  # JAX-compile-heavy (see pytest.ini)

SHAPES = [(8, 8, 8), (16, 16, 16), (7, 5, 3), (18, 18, 18), (12, 20, 8),
          (17, 19, 23), (64, 64, 21)]


def _run(dims, mags, signs):
    pmsb = sw.msbp1(mags)
    num_bp = int(pmsb.max())
    if num_bp == 0:
        return
    tree = sw.build_tree(dims)
    node_max = sw.compute_node_max(tree, pmsb)
    node_s = np.where(node_max > 0, num_bp - node_max, sw._NEVER).astype(
        np.int32
    )
    s_lin = np.where(pmsb > 0, num_bp - pmsb, sw._NEVER).astype(np.int32)
    want = ss.lis_segments_sorted(tree, node_s, s_lin, signs, num_bp)

    li = sl.lis_index(dims)
    node_cap = int((node_s < sw._NEVER).sum()) + 8
    total_bits = sum(seg.size for seg in want)
    ev_cap = total_bits + 64
    cap_total = sum((seg.size + 7) // 8 for seg in want) + 16
    buf, counts, total_bytes, n_sig = sl.lis_segments_device(
        jnp.asarray(node_s), jnp.asarray(s_lin), jnp.asarray(signs),
        jnp.int32(num_bp), li, 20, node_cap, ev_cap, cap_total,
    )
    buf = np.asarray(buf)
    counts = np.asarray(counts)
    assert int(n_sig) == int((node_s < sw._NEVER).sum())
    bc = (counts.astype(np.int64) + 7) // 8
    offs = np.cumsum(bc) - bc
    assert int(total_bytes) == int(bc[:num_bp].sum())
    for p in range(num_bp):
        got = np.unpackbits(
            buf[offs[p] : offs[p] + bc[p]], bitorder="little"
        )[: counts[p]]
        np.testing.assert_array_equal(got, want[p])


@pytest.mark.parametrize("dims", SHAPES)
def test_device_lis_matches_host(dims):
    rng = np.random.default_rng(hash(dims) % (2**31) + 31)
    n = int(np.prod(dims))
    for density in (0.05, 0.4):
        for magcap in (8, 1 << 15):
            mags = np.zeros(n, dtype=np.uint64)
            k = max(1, int(n * density))
            mags[rng.choice(n, k, replace=False)] = rng.integers(
                1, magcap, size=k
            )
            signs = rng.random(n) > 0.5
            _run(dims, mags, signs)


def test_device_lis_structured_field():
    from sperr_tpu.ops import cdf97_np

    dims = (32, 32, 32)
    nz, ny, nx = dims[2], dims[1], dims[0]
    z, y, x = np.mgrid[0:nz, 0:ny, 0:nx]
    f = np.sin(x * 0.19) * np.cos(y * 0.23) * np.sin(z * 0.11 + 0.7)
    co = cdf97_np.dwt3d(f - f.mean())
    ll = np.rint(co.ravel() / 0.01).astype(np.int64)
    _run(dims, np.abs(ll).astype(np.uint64), ll >= 0)
