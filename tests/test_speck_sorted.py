"""Sorted SPECK emission (codec/speck_sorted.py): the set walk as a sort.

Pins segment-level equality between the recursive walk and the sorted
emission across shapes and densities (including the root/born interleaving
case that requires roots-first ordering within a birth group)."""

import numpy as np
import pytest

from sperr_tpu.codec import speck_sorted as ss
from sperr_tpu.codec import speck_wave as sw


pytestmark = pytest.mark.slow  # JAX-compile-heavy (see pytest.ini)

SHAPES = [(8, 8, 8), (16, 16, 16), (7, 5, 3), (18, 18, 18), (64, 64, 21),
          (2, 2, 2), (1, 1, 8), (17, 19, 23)]


def _segments_via_walk(tree, node_s, s_lin, signs, num_bp):
    walk = sw._EncWalk(tree, node_s, s_lin, signs)
    for rid in tree.root_ids:
        walk.add_root(int(rid), int(tree.root_levels[rid]))
    return [walk.lis_pass(p) for p in range(num_bp)]


@pytest.mark.parametrize("dims", SHAPES)
def test_sorted_segments_match_walk(dims):
    rng = np.random.default_rng(hash(dims) % (2**31))
    n = int(np.prod(dims))
    for density in (0.03, 0.5):
        mags = np.zeros(n, dtype=np.uint64)
        k = max(1, int(n * density))
        mags[rng.choice(n, k, replace=False)] = rng.integers(1, 1 << 17, size=k)
        signs = rng.random(n) > 0.5
        pmsb = sw.msbp1(mags)
        num_bp = int(pmsb.max())
        if num_bp == 0:
            continue
        tree = sw.build_tree(dims)
        node_max = sw.compute_node_max(tree, pmsb)
        node_s = np.where(node_max > 0, num_bp - node_max, sw._NEVER).astype(
            np.int32
        )
        s_lin = np.where(pmsb > 0, num_bp - pmsb, sw._NEVER).astype(np.int32)
        want = _segments_via_walk(tree, node_s, s_lin, signs, num_bp)
        got = ss.lis_segments_sorted(tree, node_s, s_lin, signs, num_bp)
        for p in range(num_bp):
            np.testing.assert_array_equal(got[p], want[p])


@pytest.mark.parametrize("dims,q", [((64, 64, 21), 0.05), ((36, 36, 9), 0.02),
                                    ((48, 40, 48), 0.08)])
def test_structured_field_low_bitplanes(dims, q):
    """DWT coefficients of a smooth field at coarse quantization: few
    bitplanes, so many same-level lists mix initial roots with born anchors
    — the case where root_rank and O must never be compared directly."""
    from sperr_tpu.ops import cdf97_np

    nx, ny, nz = dims
    z, y, x = np.mgrid[0:nz, 0:ny, 0:nx]
    f = np.sin(x * 0.19) * np.cos(y * 0.23) * np.sin(z * 0.11 + 0.7)
    co = cdf97_np.dwt3d(f - f.mean())
    ll = np.rint(co.ravel() / q).astype(np.int64)
    mags = np.abs(ll).astype(np.uint64)
    signs = ll >= 0
    pmsb = sw.msbp1(mags)
    num_bp = int(pmsb.max())
    assert num_bp > 0
    tree = sw.build_tree(dims)
    node_max = sw.compute_node_max(tree, pmsb)
    node_s = np.where(node_max > 0, num_bp - node_max, sw._NEVER).astype(np.int32)
    s_lin = np.where(pmsb > 0, num_bp - pmsb, sw._NEVER).astype(np.int32)
    want = _segments_via_walk(tree, node_s, s_lin, signs, num_bp)
    got = ss.lis_segments_sorted(tree, node_s, s_lin, signs, num_bp)
    for p in range(num_bp):
        np.testing.assert_array_equal(got[p], want[p])


@pytest.mark.parametrize("dims", [(16, 16, 16), (18, 18, 18), (64, 64, 21)])
def test_low_magnitude_fuzz(dims):
    """Magnitudes <= 7 (<=3 bitplanes): dense same-birth groups across many
    levels stress the anchor ordering."""
    rng = np.random.default_rng(hash(dims) % (2**31) + 7)
    n = int(np.prod(dims))
    for density in (0.1, 0.7):
        mags = np.zeros(n, dtype=np.uint64)
        k = max(1, int(n * density))
        mags[rng.choice(n, k, replace=False)] = rng.integers(1, 8, size=k)
        signs = rng.random(n) > 0.5
        pmsb = sw.msbp1(mags)
        num_bp = int(pmsb.max())
        tree = sw.build_tree(dims)
        node_max = sw.compute_node_max(tree, pmsb)
        node_s = np.where(node_max > 0, num_bp - node_max, sw._NEVER).astype(
            np.int32
        )
        s_lin = np.where(pmsb > 0, num_bp - pmsb, sw._NEVER).astype(np.int32)
        want = _segments_via_walk(tree, node_s, s_lin, signs, num_bp)
        got = ss.lis_segments_sorted(tree, node_s, s_lin, signs, num_bp)
        for p in range(num_bp):
            np.testing.assert_array_equal(got[p], want[p])


def _walk_segments_2d(tree, node_s, s_lin, signs, num_bp, iset_s):
    walk = sw._EncWalk(tree, node_s, s_lin, signs)
    walk.add_root(0, int(tree.node_level[0]))
    i_lev = [tree.xf if tree.xf > 0 else 0]

    def process_i(p, bits, decide=True):
        if i_lev[0] <= 0:
            return
        sig = iset_s[i_lev[0]] == p
        if decide:
            bits.bit(1 if sig else 0)
        if sig:
            code_i(p, bits)

    def code_i(p, bits):
        k = i_lev[0]
        i_lev[0] -= 1
        counter = 0
        for nid in tree.iset_groups[k]:
            sig = node_s[nid] == p
            bits.bit(1 if sig else 0)
            if sig:
                counter += 1
                walk.code_s(nid, p, bits)
            else:
                walk.born[int(tree.node_level[nid])].append(nid)
        process_i(p, bits, counter != 0)

    return [walk.lis_pass(p, i_hook=process_i) for p in range(num_bp)]


def _case_2d(dims, mags, signs):
    nx, ny = dims
    pmsb = sw.msbp1(mags)
    num_bp = int(pmsb.max())
    tree = sw.build_tree2(dims)
    node_max = sw.compute_node_max(tree, pmsb)
    node_s = np.where(node_max > 0, num_bp - node_max, sw._NEVER).astype(np.int32)
    s_lin = np.where(pmsb > 0, num_bp - pmsb, sw._NEVER).astype(np.int32)
    iset_max = sw._iset_maxes(tree, pmsb.reshape(ny, nx))
    iset_s = np.where(iset_max > 0, num_bp - iset_max, sw._NEVER).astype(np.int64)
    want = _walk_segments_2d(tree, node_s, s_lin, signs, num_bp, iset_s)
    got = ss.lis_segments_sorted_2d(tree, node_s, s_lin, signs, num_bp, iset_s)
    for p in range(num_bp):
        np.testing.assert_array_equal(got[p], want[p])


SHAPES_2D = [(8, 8), (16, 16), (32, 32), (17, 19), (64, 21), (9, 9), (7, 5),
             (33, 65), (128, 41)]


@pytest.mark.parametrize("dims", SHAPES_2D)
def test_sorted_2d_segments_match_walk(dims):
    """Including I-set recursions, group nodes surviving into lists, and
    low-bitplane dense same-birth groups."""
    rng = np.random.default_rng(hash(dims) % (2**31) + 13)
    n = int(np.prod(dims))
    for density in (0.02, 0.3, 0.8):
        for magcap in (8, 1 << 15):
            mags = np.zeros(n, dtype=np.uint64)
            k = max(1, int(n * density))
            mags[rng.choice(n, k, replace=False)] = rng.integers(
                1, magcap, size=k
            )
            signs = rng.random(n) > 0.5
            if sw.msbp1(mags).max() == 0:
                continue
            _case_2d(dims, mags, signs)


@pytest.mark.parametrize("dims,q", [((64, 64), 0.05), ((99, 131), 0.002)])
def test_sorted_2d_structured_field(dims, q):
    from sperr_tpu.ops import cdf97_np

    nx, ny = dims
    y, x = np.mgrid[0:ny, 0:nx]
    f = np.sin(x * 0.17) * np.cos(y * 0.23)
    co = cdf97_np.dwt2d(f - f.mean())
    ll = np.rint(co.ravel() / q).astype(np.int64)
    mags = np.abs(ll).astype(np.uint64)
    _case_2d(dims, mags, ll >= 0)


def test_roots_precede_born_within_birth_group():
    """A coarse root partitioning at pass 0 appends children into a list that
    still holds unpartitioned roots; the sorted order must keep roots first
    (verified against the walk)."""
    dims = (18, 18, 18)
    n = int(np.prod(dims))
    mags = np.zeros(n, dtype=np.uint64)
    mags[n - 1] = 1024  # level-3 root region: partitions at pass 0
    mags[0] = 3         # chain corner: level-6 roots survive, partition later
    signs = np.ones(n, dtype=bool)
    pmsb = sw.msbp1(mags)
    num_bp = int(pmsb.max())
    tree = sw.build_tree(dims)
    node_max = sw.compute_node_max(tree, pmsb)
    node_s = np.where(node_max > 0, num_bp - node_max, sw._NEVER).astype(np.int32)
    s_lin = np.where(pmsb > 0, num_bp - pmsb, sw._NEVER).astype(np.int32)
    want = _segments_via_walk(tree, node_s, s_lin, signs, num_bp)
    got = ss.lis_segments_sorted(tree, node_s, s_lin, signs, num_bp)
    for p in range(num_bp):
        np.testing.assert_array_equal(got[p], want[p])
