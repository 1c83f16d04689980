"""Unit tests for the prefix-pack emission pipeline (ops/packemit.py).

Every component is validated against a direct NumPy oracle; masked_pack
end-to-end must byte-match masked_pack_reference over randomized masks,
densities, multi-part row shapes, and the empty/full edge cases.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sperr_tpu.ops import packemit as pe


def _np_pext32(x, m):
    out = 0
    k = 0
    for j in range(32):
        if (m >> j) & 1:
            out |= ((x >> j) & 1) << k
            k += 1
    return out


def test_pext32_exhaustive_random():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**32, 4096, dtype=np.uint64).astype(np.uint32)
    m = rng.integers(0, 2**32, 4096, dtype=np.uint64).astype(np.uint32)
    # include edge masks
    m[:4] = [0, 0xFFFFFFFF, 1, 0x80000000]
    got = np.asarray(pe.pext32(jnp.asarray(x), jnp.asarray(m)))
    want = np.asarray(
        [_np_pext32(int(a), int(b)) for a, b in zip(x, m)], dtype=np.uint32
    )
    np.testing.assert_array_equal(got, want)


def test_cells_to_words_roundtrip():
    rng = np.random.default_rng(1)
    cells = rng.integers(0, 2, (3, 256), dtype=np.uint8)
    w = np.asarray(pe.cells_to_words(jnp.asarray(cells)))
    assert w.shape == (3, 8)
    for r in range(3):
        bits = np.unpackbits(
            w[r].view(np.uint8), bitorder="little"
        )
        np.testing.assert_array_equal(bits, cells[r])


def test_pack_cells_interleaved():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 2, 1024 + 512, dtype=np.uint8)
    b = rng.integers(0, 2, 1024 + 512, dtype=np.uint8)
    w = np.asarray(pe.pack_cells_interleaved(jnp.asarray(a), jnp.asarray(b)))
    bits = np.unpackbits(w.view(np.uint8), bitorder="little")
    inter = np.empty(2 * a.size, np.uint8)
    inter[0::2] = a
    inter[1::2] = b
    np.testing.assert_array_equal(bits[: inter.size], inter)


def test_blocked_cumsum_excl():
    rng = np.random.default_rng(2)
    for n in (1, 7, 256, 1000, 70000):
        x = rng.integers(0, 32, n).astype(np.int32)
        got = np.asarray(pe.blocked_cumsum_excl(jnp.asarray(x)))
        want = np.cumsum(x) - x
        np.testing.assert_array_equal(got, want)


def _run_pack(parts_np, evb_cap=None, out_cap=None, piece_words=8):
    parts_dev = []
    for valid, bits in parts_np:
        vw = pe.cells_to_words(jnp.asarray(valid.astype(np.uint8)))
        bw = pe.cells_to_words(jnp.asarray(bits.astype(np.uint8)))
        parts_dev.append((vw, bw))
    tot_cells = sum(v.size for v, _ in parts_np)
    nrows = sum(v.shape[0] for v, _ in parts_np)
    if out_cap is None:
        out_cap = ((tot_cells // 8 + nrows + 7) // 4 + 1) * 4
    if evb_cap is None:
        evb_cap = tot_cells // (32 * piece_words) + 1
    res = pe.masked_pack(parts_dev, evb_cap, out_cap, piece_words)
    return res, out_cap


@pytest.mark.parametrize("density", [0.0, 0.03, 0.3, 0.8, 1.0])
@pytest.mark.parametrize("piece_words", [4, 8])
def test_masked_pack_matches_reference(density, piece_words):
    rng = np.random.default_rng(int(density * 100) + piece_words)
    parts = []
    for rows, L in ((5, 512), (3, 1024), (4, 256)):
        valid = (rng.random((rows, L)) < density).astype(np.uint8)
        bits = rng.integers(0, 2, (rows, L), dtype=np.uint8) & valid
        parts.append((valid, bits))
    res, out_cap = _run_pack(parts, piece_words=piece_words)
    assert not bool(res.overflow)
    ref_bytes, ref_counts = pe.masked_pack_reference(parts)
    np.testing.assert_array_equal(np.asarray(res.counts), ref_counts)
    got = np.asarray(pe.words_to_bytes(res.out_words))
    tb = int(res.total_bytes)
    assert tb == ref_bytes.size
    np.testing.assert_array_equal(got[:tb], ref_bytes)
    # bytes past the stream must be zero (clean buffer for slicing)
    assert not got[tb:].any()


def test_masked_pack_clustered_and_single_bits():
    rng = np.random.default_rng(9)
    rows, L = 6, 2048
    valid = np.zeros((rows, L), np.uint8)
    # clusters + isolated bits + a full row + an empty row
    valid[0, 100:400] = 1
    valid[1, ::97] = 1
    valid[2] = 1
    valid[4, L - 1] = 1
    valid[5, :64] = 1
    bits = rng.integers(0, 2, (rows, L), dtype=np.uint8) & valid
    res, _ = _run_pack([(valid, bits)])
    ref_bytes, ref_counts = pe.masked_pack_reference([(valid, bits)])
    np.testing.assert_array_equal(np.asarray(res.counts), ref_counts)
    got = np.asarray(pe.words_to_bytes(res.out_words))
    np.testing.assert_array_equal(got[: ref_bytes.size], ref_bytes)


def test_masked_pack_overflow_flags():
    valid = np.ones((2, 512), np.uint8)
    bits = np.ones((2, 512), np.uint8)
    res, _ = _run_pack([(valid, bits)], evb_cap=1)
    assert bool(res.overflow)
    # byte-cap overflow
    res2, _ = _run_pack([(valid, bits)], out_cap=16)
    assert bool(res2.overflow)


def test_masked_pack_under_vmap_jit():
    rng = np.random.default_rng(3)
    B, rows, L = 3, 4, 512
    valid = (rng.random((B, rows, L)) < 0.2).astype(np.uint8)
    bits = rng.integers(0, 2, (B, rows, L), dtype=np.uint8) & valid

    @jax.jit
    def run(v, b):
        def one(vv, bb):
            vw = pe.cells_to_words(vv)
            bw = pe.cells_to_words(bb)
            return pe.masked_pack([(vw, bw)], 64, 512)

        return jax.vmap(one)(v, b)

    res = run(jnp.asarray(valid), jnp.asarray(bits))
    for k in range(B):
        ref_bytes, ref_counts = pe.masked_pack_reference(
            [(valid[k], bits[k])]
        )
        np.testing.assert_array_equal(np.asarray(res.counts[k]), ref_counts)
        got = np.asarray(pe.words_to_bytes(res.out_words[k]))
        np.testing.assert_array_equal(got[: ref_bytes.size], ref_bytes)
