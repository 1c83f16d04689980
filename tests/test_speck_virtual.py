"""The table-free virtual forest (power-of-two cubes) must reproduce the
table-backed schedule and LIS walk exactly: same node numbering, same
(s, e, node-max) schedule, byte-identical walk segments, and the full
device wave path must stay byte-identical to the host engine."""

import jax.numpy as jnp
import numpy as np
import pytest

from sperr_tpu.ops import speck_jax as sj
from sperr_tpu.ops import speck_lis_jax as sl
from sperr_tpu.ops import speck_virtual as sv


pytestmark = pytest.mark.slow  # JAX-compile-heavy (see pytest.ini)

_NEVER = 0x7FFF


def _mags(n, seed, density=0.4, hi=1 << 15):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, hi, size=n) * (rng.random(n) < density)
    ).astype(np.uint32)


def test_pow2_cube_predicate():
    assert sv._is_pow2_cube((16, 16, 16))
    assert sv._is_pow2_cube((256, 256, 256))
    assert not sv._is_pow2_cube((16, 16, 8))
    assert not sv._is_pow2_cube((96, 96, 96))
    assert not sv._is_pow2_cube((128, 128, 41))


@pytest.mark.parametrize("N", [16, 32])
def test_numbering_matches_tree(N):
    """Virtual (root, depth, morton) numbering == build_tree BFS ids:
    per-node level, parent, and child resolution all agree."""
    from sperr_tpu.codec.speck_wave import build_tree

    tree = build_tree((N, N, N))
    vf = sv.virtual_lis_index((N, N, N))
    li = sl.lis_index((N, N, N))
    nn = tree.node_ch_start.size
    assert vf.nn == nn
    assert vf.nroots == li.nroots
    ids = jnp.arange(nn, dtype=jnp.int32)
    assert (
        np.asarray(vf.levels_of(ids)) == tree.node_level.astype(np.int32)
    ).all()
    vpw = [np.asarray(w) for w in vf.paths_of(ids)]
    tpw = [np.asarray(li.pw[:, k]) for k in range(2)]
    assert (vpw[0] == tpw[0]).all() and (vpw[1] == tpw[1]).all()
    # parents via one anchor step: node_s == bq at the parent forces a move
    r, d, m = vf.decode(ids)
    pd = jnp.maximum(d - 1, 0)
    pid = np.asarray(vf.nid(r, pd, m >> 3))
    tpar = np.asarray(li.parent)
    nonroot = tpar >= 0
    assert (pid[nonroot] == tpar[nonroot]).all()


@pytest.mark.parametrize("N", [16, 32, 64])
@pytest.mark.parametrize("seed", [0, 1])
def test_schedule_matches_table(N, seed):
    n = N**3
    mags = _mags(n, seed)
    ti = sj.tree_index((N, N, N))
    vf = sv.virtual_lis_index((N, N, N))
    pm = sj.msbp1_device(jnp.asarray(mags))
    num_bp = jnp.max(pm)
    s1, e1, nm1 = sj.pixel_schedule(jnp.asarray(mags), ti, num_bp)
    s2, e2, nm2 = sv.pixel_schedule_virtual(jnp.asarray(mags), vf, num_bp)
    assert (np.asarray(s1) == np.asarray(s2)).all()
    assert (np.asarray(e1) == np.asarray(e2)).all()
    assert (np.asarray(nm1) == np.asarray(nm2)).all()


@pytest.mark.parametrize(
    "N,seed,density",
    [(16, 0, 0.4), (32, 1, 0.7), (32, 2, 0.05), (64, 3, 0.3)],
)
def test_walk_matches_table(N, seed, density):
    n = N**3
    mags = _mags(n, seed, density)
    ti = sj.tree_index((N, N, N))
    vf = sv.virtual_lis_index((N, N, N))
    li = sl.lis_index((N, N, N))
    pm = sj.msbp1_device(jnp.asarray(mags))
    num_bp = jnp.max(pm)
    s, e, nm = sj.pixel_schedule(jnp.asarray(mags), ti, num_bp)
    node_s = jnp.where(nm > 0, num_bp - nm, _NEVER).astype(jnp.int32)
    rng = np.random.default_rng(seed + 100)
    sgn = jnp.asarray(rng.random(n) < 0.5)
    kw = dict(num_bp_cap=34, node_cap=li.nn, ev_cap=4 * n, cap_total=n)
    b1, c1, t1, ns1 = sl.lis_segments_device(node_s, s, sgn, num_bp, li, **kw)
    b2, c2, t2, ns2 = sl.lis_segments_device(node_s, s, sgn, num_bp, vf, **kw)
    assert int(t1) == int(t2)
    assert int(ns1) == int(ns2)
    assert (np.asarray(c1) == np.asarray(c2)).all()
    assert (np.asarray(b1) == np.asarray(b2)).all()


@pytest.mark.parametrize("fill", ["zeros", "single", "ones"])
def test_walk_degenerate_fields(fill):
    N = 32
    n = N**3
    mags = np.zeros(n, np.uint32)
    if fill == "single":
        mags[12345] = 7
    elif fill == "ones":
        mags[:] = 1
    ti = sj.tree_index((N, N, N))
    vf = sv.virtual_lis_index((N, N, N))
    li = sl.lis_index((N, N, N))
    pm = sj.msbp1_device(jnp.asarray(mags))
    num_bp = jnp.max(pm)
    s, e, nm = sj.pixel_schedule(jnp.asarray(mags), ti, num_bp)
    s2, e2, nm2 = sv.pixel_schedule_virtual(jnp.asarray(mags), vf, num_bp)
    assert (np.asarray(nm) == np.asarray(nm2)).all()
    node_s = jnp.where(nm > 0, num_bp - nm, _NEVER).astype(jnp.int32)
    sgn = jnp.asarray(np.ones(n, bool))
    kw = dict(num_bp_cap=34, node_cap=li.nn, ev_cap=4 * n, cap_total=n)
    b1, c1, t1, _ = sl.lis_segments_device(node_s, s, sgn, num_bp, li, **kw)
    b2, c2, t2, _ = sl.lis_segments_device(node_s, s, sgn, num_bp, vf, **kw)
    assert int(t1) == int(t2)
    assert (np.asarray(b1) == np.asarray(b2)).all()


def test_wave_driver_uses_virtual_and_stays_byte_identical():
    """TpuCompressor3D wave entropy on a 32^3 pow-2 cube (virtual index
    path) must produce the same stream as the host-entropy tier of the
    same driver (shared device quantization, independent entropy)."""
    from sperr_tpu.parallel.batched import TpuCompressor3D

    N = 32
    rng = np.random.default_rng(11)
    vol = rng.normal(size=(N, N, N)).astype(np.float32) * 0.05
    comp = TpuCompressor3D((N, N, N), (N, N, N), entropy="wave")
    stream_dev = bytes(comp.compress(vol, "pwe", 1e-2))
    assert comp.last_wave_chunks == 1, "virtual wave path must not fall back"
    hostc = TpuCompressor3D((N, N, N), (N, N, N), entropy="host")
    stream_host = bytes(hostc.compress(vol, "pwe", 1e-2))
    assert stream_dev == stream_host
