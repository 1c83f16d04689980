"""The cummax-packed interval expansion must match the associative-scan
form exactly (valid region) for every payload width/cap combination the
emitters use."""

import jax.numpy as jnp
import numpy as np
import pytest

from sperr_tpu.ops.speck_jax import _expand_fill


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "widths,ev_cap",
    [([14], 256), ([6, 31], 512), ([18], 64), ([31], 1 << 20)],
)
def test_packed_matches_scan(seed, widths, ev_cap):
    rng = np.random.default_rng(seed)
    T = 97
    ln = rng.integers(0, 6, size=T).astype(np.int32)
    ln[rng.random(T) < 0.3] = 0  # plenty of non-emitting items
    words = [
        rng.integers(0, 1 << min(w, 31), size=T, dtype=np.int64).astype(
            np.int32
        )
        for w in widths
    ]
    ln_j = jnp.asarray(ln)
    words_j = [jnp.asarray(w) for w in words]

    ref_f, ref_rel, ref_ok, ref_total = _expand_fill(
        ln_j, words_j, ev_cap, widths=None
    )
    new_f, new_rel, new_ok, new_total = _expand_fill(
        ln_j, words_j, ev_cap, widths=widths
    )
    assert int(ref_total) == int(new_total)
    ok = np.asarray(ref_ok)
    assert (np.asarray(new_ok) == ok).all()
    for rf, nf in zip(ref_f, new_f):
        assert (np.asarray(rf)[ok] == np.asarray(nf)[ok]).all()
    assert (np.asarray(ref_rel)[ok] == np.asarray(new_rel)[ok]).all()


def test_packed_overflow_region_masked():
    # events past ev_cap are invalid; the valid prefix must still be exact
    ln = jnp.asarray(np.array([3, 4, 5, 6], dtype=np.int32))
    w = jnp.asarray(np.array([5, 9, 12, 3], dtype=np.int32))
    (f,), rel, ok, total = _expand_fill(ln, [w], 8, widths=[4])
    assert int(total) == 18
    okh = np.asarray(ok)
    assert okh.sum() == 8
    exp_w = [5, 5, 5, 9, 9, 9, 9, 12]
    exp_rel = [0, 1, 2, 0, 1, 2, 3, 0]
    assert np.asarray(f)[:8].tolist() == exp_w
    assert np.asarray(rel)[:8].tolist() == exp_rel
