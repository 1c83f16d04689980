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


def test_transpose_bits32_roundtrip_oracle():
    """transpose_bits32 against a bit-level numpy oracle + inverse."""
    import jax

    from sperr_tpu.ops.packemit import transpose_bits32, untranspose_bits32

    rng = np.random.default_rng(0)
    M = 32 * 17
    x = rng.integers(0, 2 ** 32, M, dtype=np.uint32)
    y = np.asarray(jax.jit(transpose_bits32)(jnp.asarray(x)))
    bits = ((x[:, None] >> np.arange(32)[None, :]) & 1).astype(np.uint8)
    oracle = np.zeros((32, M // 32), np.uint32)
    for p in range(32):
        for w in range(M // 32):
            v = 0
            for l in range(32):
                v |= int(bits[32 * w + l, p]) << l
            oracle[p, w] = v
    assert (y == oracle).all()
    x2 = np.asarray(jax.jit(untranspose_bits32)(jnp.asarray(y)))
    assert (x2 == x).all()


def test_transpose_bits32_pair_matches_interleave():
    import jax

    from sperr_tpu.ops.packemit import transpose_bits32, transpose_bits32_pair

    rng = np.random.default_rng(3)
    M = 16 * 13
    a = rng.integers(0, 2 ** 32, M, dtype=np.uint32)
    b = rng.integers(0, 2 ** 32, M, dtype=np.uint32)
    mv = np.empty(2 * M, np.uint32)
    mv[0::2] = a
    mv[1::2] = b
    want = np.asarray(jax.jit(transpose_bits32)(jnp.asarray(mv)))
    got = np.asarray(
        jax.jit(transpose_bits32_pair)(jnp.asarray(a), jnp.asarray(b))
    )
    assert (want == got).all()


@pytest.mark.parametrize(
    "B,n,dens,take",
    [(1, 4096, 0.02, 256), (3, 2048, 0.3, 1024), (2, 8192, 0.0, 64),
     (1, 1024, 1.0, 1024), (2, 4100, 0.05, 64)],
)
def test_compact_flags_rows(B, n, dens, take):
    """Two-level flag compaction: ascending indices, exact counts,
    sentinel fill, overflow truncation, non-multiple-of-block widths."""
    import jax

    from sperr_tpu.ops.packemit import compact_flags_rows

    rng = np.random.default_rng(B * 1000 + n)
    flags = rng.random((B, n)) < dens
    idx, cnt = jax.jit(
        lambda f: compact_flags_rows(f, take)
    )(jnp.asarray(flags))
    idx = np.asarray(idx)
    cnt = np.asarray(cnt)
    for b in range(B):
        truth = np.flatnonzero(flags[b])
        assert cnt[b] == truth.size
        m = min(take, truth.size)
        assert (idx[b][:m] == truth[:m]).all()
        assert (idx[b][m:] == n).all()


def test_bit_helpers():
    from sperr_tpu.ops.packemit import (
        bit_at32, bitrev32, ones_low32, ones_span32,
    )

    k = jnp.arange(34, dtype=jnp.int32)
    ol = np.asarray(ones_low32(k))
    for i in range(34):
        assert ol[i] == (0xFFFFFFFF if i >= 32 else (1 << i) - 1)
    lo = jnp.asarray([0, 3, 10, 31, 40, -2])
    hi = jnp.asarray([0, 5, 9, 31, 50, 4])
    sp = np.asarray(ones_span32(lo, hi))
    assert sp[0] == 1 and sp[1] == 0b111000 and sp[2] == 0
    assert sp[3] == 0x80000000 and sp[4] == 0 and sp[5] == 0b11111
    p = jnp.asarray([0, 31, 32, -1, 5])
    ba = np.asarray(bit_at32(p))
    assert list(ba) == [1, 0x80000000, 0, 0, 32]
    x = jnp.asarray([0x1, 0x80000000, 0xDEADBEEF], dtype=jnp.uint32)
    rv = np.asarray(bitrev32(x))
    assert rv[0] == 0x80000000 and rv[1] == 1
    assert rv[2] == int(f"{0xDEADBEEF:032b}"[::-1], 2)
