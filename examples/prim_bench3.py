"""Third primitive batch: strided slices, selector matmuls, pipeline parts."""
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from sperr_tpu.runtime.device_bench import time_stage  # noqa: E402
from sperr_tpu.ops import packemit as pe  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    res = {}

    def t(name, fn, x, iters=4):
        s = time_stage(fn, x, iters=iters)
        res[name] = round(s * 1e3, 3)
        print(name, res[name], "ms", flush=True)

    n = 1 << 24
    x = jnp.asarray(rng.integers(0, 2**30, n, dtype=np.int32))

    # strided slices at several strides
    for st in (2, 8):
        t(f"strided_slice_{st}_16M",
          lambda v, st=st: jax.lax.slice(v, (0,), (n,), (st,)) + 1, x)

    # even+odd pair (the merge-level access pattern)
    def evenodd(v):
        return pe._even(v) + pe._odd(v)

    t("even_plus_odd_16M", evenodd, x)

    # selector matmul pack: 16.7M cells
    cells = jnp.asarray(rng.integers(0, 2, n, dtype=np.uint8))
    t("pack_cells_flat_16M", pe.pack_cells_flat, cells)

    # pext at word scale
    xw = jnp.asarray(rng.integers(0, 2**32, n // 32, dtype=np.uint64).astype(np.uint32))
    t("pext_524K", lambda v: pe.pext32(v, v ^ jnp.uint32(123)), xw)

    # blocked cumsum at 16.7M
    t("blocked_cumsum_16M", pe.blocked_cumsum_excl, x & 1)

    # one merge level at 8M pieces of 1 word
    w8 = jnp.asarray(rng.integers(0, 2**32, 1 << 23, dtype=np.uint64).astype(np.uint32))
    c8 = jnp.asarray(rng.integers(0, 33, 1 << 23, dtype=np.int32))

    def merge1(v):
        out, c = pe._merge_level([v], c8)
        return out[0] ^ out[1] ^ c.astype(jnp.uint32)

    t("merge_level1_8M", merge1, w8)

    # full masked_pack at [34, 524288]-words scale (approx 256^3 ref class)
    P, Wc = 34, 1 << 19
    vw = jnp.asarray(
        rng.integers(0, 2**32, (P, Wc), dtype=np.uint64).astype(np.uint32)
    )
    # sparse-ish validity: ~2% bits set
    vv = vw & (vw >> 7) & (vw >> 13) & (vw >> 23) & jnp.uint32(0x01010101)

    def mpack(v):
        r = pe.masked_pack([(v, vw)], 1 << 19, 1 << 22)
        return r.out_words

    t("masked_pack_34x512Kw", mpack, vv, iters=2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
