"""Second primitive batch: row-gathers, small flat sorts, scatter-add rates.

Decides the movement strategy for the masked-pack entropy stage:
element-gathers measured at only ~73M elem/s; if gathering whole ROWS
([N, W] by row index) costs ~per-row rather than ~per-element, wide-row
moves become the compaction workhorse.
"""
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from sperr_tpu.runtime.device_bench import time_stage  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    res = {}

    def t(name, fn, x, iters=4):
        s = time_stage(fn, x, iters=iters)
        res[name] = round(s * 1e3, 3)
        print(name, res[name], "ms", flush=True)

    # row gathers: [2M, W] table, gather 256K rows
    NTAB = 1 << 21
    NG = 1 << 18
    idx = jnp.asarray(rng.integers(0, NTAB, NG, dtype=np.int32))
    for W in (4, 8, 16):
        tbl = jnp.asarray(rng.integers(0, 2**30, (NTAB, W), dtype=np.int32))

        def rowg(i, tbl=tbl):
            return tbl[i]

        t(f"rowgather_256K_w{W}", rowg, idx)
    # same via one-hot matmul? too big. via take_along_axis equivalent only.

    # element gather smaller scales
    tbl1 = jnp.asarray(rng.integers(0, 2**30, NTAB, dtype=np.int32))
    for NGe in (1 << 16, 1 << 18):
        idxe = jnp.asarray(rng.integers(0, NTAB, NGe, dtype=np.int32))
        t(f"gather_{NGe>>10}K_elem", lambda i: tbl1[i], idxe)

    # flat sorts at small scales, multi-operand
    for n in (1 << 20, 1 << 21, 1 << 22):
        x = jnp.asarray(rng.integers(0, 2**30, n, dtype=np.int32))
        t(f"sortflat1_{n>>20}M", lambda v: jax.lax.sort((v,), num_keys=1, is_stable=False)[0], x)
    x2 = jnp.asarray(rng.integers(0, 2**30, 1 << 21, dtype=np.int32))

    def sort4(v):
        o = jax.lax.sort((v, v + 1, v + 2, v + 3), num_keys=1, is_stable=False)
        return o[3]

    t("sortflat4op_2M", sort4, x2)

    def sort10(v):
        ops = tuple(v + i for i in range(10))
        return jax.lax.sort(ops, num_keys=1, is_stable=False)[9]

    t("sortflat10op_2M", sort10, x2)

    # scatter-add rates at several update counts into 1M targets
    grid = 1 << 20
    for NU in (1 << 18, 1 << 20, 1 << 21):
        pos = jnp.asarray(rng.integers(0, grid, NU, dtype=np.int32))

        def scadd(p):
            return jnp.zeros(grid, jnp.int32).at[p].add(jnp.int32(1))

        t(f"scatteradd_{NU>>18}x256K", scadd, pos)

    # scatter ROWS: [NU, 8] rows into [1M, 8] target by row index
    NU = 1 << 18
    posr = jnp.asarray(rng.integers(0, grid, NU, dtype=np.int32))
    valr = jnp.asarray(rng.integers(0, 2**30, (NU, 8), dtype=np.int32))

    def scrow(p):
        return jnp.zeros((grid, 8), jnp.int32).at[p].add(valr)

    t("scatteraddrow_256K_w8", scrow, posr)

    # batched sort with small blocks
    n = 1 << 24
    xi = jnp.asarray(rng.integers(0, 2**30, n, dtype=np.int32))
    for K in (32, 64, 128):
        xb = xi.reshape(n // K, K)
        t(f"sort_batched_{K}", lambda v: jax.lax.sort((v,), dimension=1, num_keys=1, is_stable=False)[0], xb)

    # u16/u8 batched sort (cheaper bytes?)
    xb8 = (xi & 0xFF).astype(jnp.uint8).reshape(n // 256, 256)
    t("sort_batched256_u8", lambda v: jax.lax.sort((v,), dimension=1, num_keys=1, is_stable=False)[0], xb8)

    # where-chain select depth 16 on [256K, 64] (merge-level cost model)
    A = jnp.asarray(rng.integers(0, 2**30, (1 << 18, 64), dtype=np.int32))

    def wchain(a):
        d = (a[:, 0] & 15)
        out = a
        for k in range(16):
            out = jnp.where((d == k)[:, None], jnp.roll(a, k, axis=1), out)
        return out

    t("wherechain16_256Kx64", wchain, A)

    # cumsum over [34, 1.3M] minor axis (rank matrix shape)
    xm = jnp.asarray(
        rng.integers(0, 2, (34, 1 << 20), dtype=np.int32)
    )
    t("cumsum_34x1M_minor", lambda v: jnp.cumsum(v, axis=1), xm)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
