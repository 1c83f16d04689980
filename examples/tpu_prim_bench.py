"""Primitive microbenchmarks for the entropy-stage redesign (run on TPU).

Measures the candidate building blocks against the incumbent sorts:

  * jax.lax.sort at various operand counts / dtypes / sizes
  * cumsum / cummax (the scan family)
  * monotone scatter (.at[pos].set with sorted positions)
  * conditional-roll compaction (log2(n) static rolls — the sort-free
    stream-compaction network for monotone 1-Lipschitz displacements)
  * the MXU packbits dot

Prints one line per measurement.  Uses runtime/device_bench.time_stage
(scalar-fetch synchronization — block_until_ready is a no-op on the
tunneled backend).
"""

import numpy as np
import jax
import jax.numpy as jnp

from sperr_tpu.runtime.device_bench import time_stage


def roll_compact(vals, keep):
    """Stable stream compaction via log2(n) conditional static rolls.

    Destination of valid element i is i - d_i with d_i = #invalid before
    i: d is nondecreasing and 1-Lipschitz, so LSB-first binary-digit
    shifts never collide two valid elements (at step k all remaining
    displacements are multiples of 2^k; a collision would need a
    difference of both >= 2^k and <= 2^k - 1).  Invalid elements and
    vacated slots get d = 0 (immovable holes, overwritten in place);
    every final rank receives its element exactly, so holes below the
    count are always overwritten."""
    n = vals.shape[0]
    inv = ~keep
    d = jnp.where(keep, jnp.cumsum(inv) - inv, 0).astype(jnp.int32)
    bits = max(1, (n - 1).bit_length())
    j = jnp.arange(n, dtype=jnp.int32)
    for k in range(bits):
        sh = 1 << k
        move = (d & sh) != 0
        move_in = jnp.roll(move, -sh) & (j < n - sh)  # mask wraparound
        vals = jnp.where(move_in, jnp.roll(vals, -sh), vals)
        d = jnp.where(move_in, jnp.roll(d, -sh) - sh, jnp.where(move, 0, d))
    return vals


def main():
    rng = np.random.default_rng(0)
    for N in (1 << 20, 1 << 24):
        tag = f"N=2^{N.bit_length() - 1}"
        ki = rng.integers(0, 1 << 30, N).astype(np.int32)
        k8 = (ki & 127).astype(np.int32)
        v = rng.integers(0, 256, N).astype(np.int32)
        x = jnp.asarray(ki)
        xk8 = jnp.asarray(k8)
        xv = jnp.asarray(v)

        t = time_stage(lambda a: jax.lax.sort((a,), num_keys=1)[0], x)
        print(f"{tag} sort 1-op i32: {t*1e3:.2f} ms  {N*4/t/1e9:.2f} GB/s")
        t = time_stage(
            lambda a: jax.lax.sort((a, a + 1), num_keys=1, is_stable=True)[1],
            x,
        )
        print(f"{tag} sort 2-op stable: {t*1e3:.2f} ms")
        t = time_stage(
            lambda a: jax.lax.sort(
                (a, a + 1, a + 2, a + 3), num_keys=1, is_stable=False
            )[3],
            x,
        )
        print(f"{tag} sort 4-op: {t*1e3:.2f} ms")
        t = time_stage(
            lambda a: jax.lax.sort(
                ((a & 127), a + 1), num_keys=1, is_stable=True
            )[1],
            x,
        )
        print(f"{tag} sort 2-op stable 7-bit key: {t*1e3:.2f} ms")
        t = time_stage(lambda a: jnp.cumsum(a), x)
        print(f"{tag} cumsum i32: {t*1e3:.2f} ms  {N*4/t/1e9:.2f} GB/s")
        t = time_stage(lambda a: jax.lax.cummax(a, axis=0), x)
        print(f"{tag} cummax i32: {t*1e3:.2f} ms")

        # monotone scatter: T items into N slots at sorted positions
        T = N // 8
        pos = np.sort(rng.choice(N, T, replace=False)).astype(np.int32)
        posj = jnp.asarray(pos)

        def mono_scatter(a):
            return jnp.zeros(N, jnp.int32).at[posj].set(a[:T], mode="drop")

        t = time_stage(mono_scatter, x)
        print(f"{tag} monotone scatter T=N/8: {t*1e3:.2f} ms")

        # roll-chain compaction (payload i32, ~50% kept)
        keep = jnp.asarray(rng.random(N) < 0.5)

        def rc(a):
            return roll_compact(a, keep)

        t = time_stage(rc, x)
        print(f"{tag} roll-compact i32 (50%): {t*1e3:.2f} ms")

        # segment-sum with sorted ids (counting-sort placement probe)
        t = time_stage(
            lambda a: jax.ops.segment_sum(
                a, posj // 64 if False else xk8, num_segments=128,
                indices_are_sorted=False,
            ),
            xv,
        )
        print(f"{tag} segment_sum 128 segs: {t*1e3:.2f} ms")

        # packbits MXU dot
        bits = jnp.asarray((v & 1).astype(np.uint8))
        from sperr_tpu.ops.speck_jax import _packbits_device

        t = time_stage(lambda a: _packbits_device(a), bits)
        print(f"{tag} packbits-dot: {t*1e3:.2f} ms  {N/8/t/1e9:.2f} GBout/s")


if __name__ == "__main__":
    # correctness check of roll_compact on CPU-sized input first
    rng = np.random.default_rng(1)
    for _ in range(5):
        n = 4096
        keep = rng.random(n) < rng.uniform(0.05, 0.95)
        vals = rng.integers(0, 1 << 30, n).astype(np.int32)
        got = np.asarray(roll_compact(jnp.asarray(vals), jnp.asarray(keep)))
        want = vals[keep]
        assert (got[: want.size] == want).all(), "roll_compact broken"
    print("roll_compact correctness: ok")
    main()
