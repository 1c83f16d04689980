"""Device half of the hybrid SPECK decode: refinement distribution +
magnitude reconstruction (the inverse of ops/wave_pack.py's emission).

The host's control-only parse (runtime/native/__init__.py
NativeEngine.decode3d_control) walks the LIP/LIS control bits and SKIPS
refinement segments — their lengths are the LSP population, a pure
function of the significance history.  This module consumes its outputs
(per-pixel significance pass, per-pass refinement bit offset and
availability) plus the raw stream body and rebuilds the exact decoded
magnitudes as array ops:

  * pass-p refinement members are {i : s_i < p} in ascending index —
    per-pixel membership MASKS (one u32 of passes) pivot to packed
    per-pass member words via the 32x32 bit transpose
    (ops/packemit.transpose_bits32); member ranks come from popcounts +
    one blocked cumsum;
  * each active (pass, word) gathers its (<= 2) source stream words,
    funnels to alignment, and PDEP-scatters the bits to its member
    lanes; only active words move (two-level compaction);
  * the deposited bit planes pivot BACK to per-pixel refinement words,
    collapsing the value ladder to a bit reversal:
    A = sum of received bits * 2^(nb-1-p) = bitrev(word) >> (32 - nb);
    decoded value = init(s) + (2A - M)/2 (+ the T == 1 bit), the closed
    form of the reference's refinement ladder (SPECK_INT.cpp:360-469:
    init 2T - T/2 - 1, then +-T/2 per bit), truncation-aware via the
    per-pass availability cutoffs.

Byte-for-byte stream compatibility is inherited from the host parse;
tests assert exact magnitude equality with the full native decode on
random and truncated streams.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import packemit as pe

_U32 = jnp.uint32


def pdep32(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """PDEP via the compress-of-masks construction (Hacker's Delight
    'expand'): precompute the move masks exactly as pext32 does, then
    apply them in reverse with left shifts."""
    x = x.astype(_U32)
    m = m.astype(_U32)
    mk = (~m) << jnp.uint32(1)
    mv_list = []
    mm = m
    for i in range(5):
        mp = mk ^ (mk << jnp.uint32(1))
        mp = mp ^ (mp << jnp.uint32(2))
        mp = mp ^ (mp << jnp.uint32(4))
        mp = mp ^ (mp << jnp.uint32(8))
        mp = mp ^ (mp << jnp.uint32(16))
        mv = mp & mm
        sh = jnp.uint32(1 << i)
        mm = (mm ^ mv) | (mv >> sh)
        mv_list.append(mv)
        mk = mk & ~mp
    for i in range(4, -1, -1):
        mv = mv_list[i]
        sh = jnp.uint32(1 << i)
        x = (x & ~mv) | ((x << sh) & mv)
    return x & m


def _ones_low(k: jnp.ndarray) -> jnp.ndarray:
    """(1 << k) - 1 for k in [0, 32], u32-safe."""
    k1 = jnp.minimum(k, jnp.uint32(31)).astype(_U32)
    base = (jnp.uint32(1) << k1) - jnp.uint32(1)
    return jnp.where(k >= 32, jnp.uint32(0xFFFFFFFF), base)


@partial(jax.jit, static_argnames=("p_cap", "evw_cap"))
def reconstruct_mags(
    spass: jnp.ndarray,       # u8/i32 [n], 255 = never significant
    body_words: jnp.ndarray,  # u32 [W] stream body (LSB-first bits)
    ref_off: jnp.ndarray,     # i32 [>= p_cap] refinement bit offsets
    ref_avail: jnp.ndarray,   # i32 [>= p_cap] refinement bits present
    num_bp: jnp.ndarray,      # i32 scalar
    p_cap: int,
    evw_cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mags i32[n], overflow bool): decoded magnitudes exactly
    matching the native full parse, plus the active-refinement-word cap
    flag — the magnitudes are valid ONLY when overflow is False (callers
    must check it and fall back to the full host parse).

    ``p_cap`` must be >= num_bp and <= 32 (host dispatches by bucket —
    num_bp is known from the stream header before tracing; streams
    deeper than 32 bitplanes take the full host parse)."""
    assert p_cap <= 32, "hybrid decode covers <= 32 bitplanes"
    n = spass.shape[0]
    npad = -(-n // 128) * 128
    s_p = jnp.concatenate(
        [spass.astype(jnp.int32), jnp.full(npad - n, 255, jnp.int32)]
    ) if npad != n else spass.astype(jnp.int32)
    P = p_cap

    # per-pixel membership masks (bit p set iff the pixel refines at
    # pass p: s < p) -> packed per-pass member words, by bit transpose
    sig_m = s_p != 255
    memb_mask = jnp.where(
        sig_m,
        pe._safe_lsh(
            jnp.uint32(0xFFFFFFFF), jnp.clip(s_p + 1, 0, 32).astype(_U32)
        ),
        jnp.uint32(0),
    )
    sv = pe.transpose_bits32(memb_mask)[:P]            # [P, Wn] u32
    Wn = sv.shape[1]
    c = jax.lax.population_count(sv).astype(jnp.int32)
    rank = pe.blocked_cumsum_excl(c.reshape(-1)).reshape(P, Wn)
    row0 = rank[:, :1]
    rank = rank - row0                                  # per-row ranks
    src_off = ref_off[:P, None] + rank                  # bit offset per word
    cutoff = jnp.clip(ref_avail[:P, None] - rank, 0, 32).astype(_U32)
    pidx = jnp.arange(P, dtype=jnp.int32)[:, None]
    active = (c > 0) & (cutoff > 0) & (pidx < num_bp)

    # compact active (pass, word) slots, ascending
    Nw = P * Wn
    take = min(evw_cap, Nw)
    sidx_r, n_act_r = pe.compact_flags_rows(active.reshape(1, Nw), take)
    sidx = jnp.minimum(sidx_r[0], Nw - 1)
    n_act = n_act_r[0]
    overflow = n_act > take
    wok = jnp.arange(take, dtype=jnp.int32) < jnp.minimum(n_act, take)

    off_c = jnp.where(wok, src_off.reshape(-1)[sidx], 0)
    sv_c = jnp.where(wok, sv.reshape(-1)[sidx], 0)
    cut_c = jnp.where(wok, cutoff.reshape(-1)[sidx], 0)
    W = body_words.shape[0]
    w0 = jnp.clip(off_c >> 5, 0, W - 1)
    rho = (off_c & 31).astype(_U32)
    lo = body_words[w0]
    hi = body_words[jnp.clip(w0 + 1, 0, W - 1)]
    aligned = pe._safe_rsh(lo, rho) | pe._safe_lsh(hi, jnp.uint32(32) - rho)
    avail_m = pdep32(_ones_low(cut_c), sv_c)
    bits_w = pdep32(aligned, sv_c) & avail_m

    planes = jnp.zeros(Nw, _U32)
    tgt = jnp.where(wok, sidx, Nw)
    planes = planes.at[tgt].set(bits_w, mode="drop").reshape(P, Wn)
    if P < 32:
        planes = jnp.concatenate([planes, jnp.zeros((32 - P, Wn), _U32)])
    # per-pixel refinement words: bit p = received bit at pass p
    apw = pe.untranspose_bits32(planes)

    # ---- closed-form value reconstruction -------------------------------
    # init(s) = 2T - T/2 - 1 with T = 2^(nb-1-s) (integer halving); the
    # per-bit ladder sums to (2A - M)/2 where A = sum of received one-bit
    # weights, M = sum of available-bit weights (both over T >= 2 passes),
    # plus the T == 1 final-pass bit.  A is a bit reversal of the
    # per-pixel word; M is CLOSED FORM: availability is full for a
    # leading run of passes (p <= pF), partial for at most one pass
    # p* = pF + 1, zero after — the full-run sum telescopes and only the
    # single partial pass expands its availability mask.
    sig = sig_m & (s_p < num_bp)
    sc = jnp.minimum(s_p, 63)
    Ts = jnp.where(
        sig, jnp.int32(1) << jnp.clip(num_bp - 1 - sc, 0, 30), 0
    )
    init = jnp.where(sig, 2 * Ts - (Ts >> 1) - 1, 0)

    nb_sh = jnp.clip(32 - num_bp, 0, 32).astype(_U32)
    a_mask = _ones_low(jnp.clip(num_bp - 1, 0, 32).astype(_U32))
    A = pe._safe_rsh(pe.bitrev32(apw & a_mask), nb_sh).astype(jnp.int32)
    last = (
        pe._safe_rsh(apw, jnp.clip(num_bp - 1, 0, 31).astype(_U32))
        & jnp.uint32(1)
    ).astype(jnp.int32)
    last = jnp.where(num_bp >= 2, last, 0)

    mc = jnp.sum(c, axis=1)  # members per pass
    pvec = jnp.arange(P, dtype=jnp.int32)
    fullp = (ref_avail[:P] >= mc) & (pvec < num_bp)
    notfull = jnp.cumsum((~fullp).astype(jnp.int32))
    pF = jnp.sum((notfull == 0).astype(jnp.int32)) - 1  # last fully-avail
    # full-run M: sum of 2^(nb-1-p) for p in [s+1, F], F = min(pF, nb-2);
    # the geometric sum telescopes to 2^(nb-1-s) - 2^(nb-1-F)
    F = jnp.minimum(pF, num_bp - 2)
    has_full = F >= sc + 1
    M_full = jnp.where(
        sig & has_full,
        (jnp.int32(1) << jnp.clip(num_bp - 1 - sc, 0, 30))
        - (jnp.int32(1) << jnp.clip(num_bp - 1 - F, 0, 30)),
        0,
    )
    # the single partial pass p* = pF + 1 (if it carries any bits and is
    # not the T == 1 pass): expand just its availability mask
    pstar = pF + 1
    has_star = (pstar < num_bp - 1) & (pstar >= 0)
    star_avail = jnp.where(
        has_star, ref_avail[jnp.clip(pstar, 0, P - 1)], 0
    )
    rank_star = rank[jnp.clip(pstar, 0, P - 1)]
    sv_star = sv[jnp.clip(pstar, 0, P - 1)]
    cut_star = jnp.clip(star_avail - rank_star, 0, 32).astype(_U32)
    am_star = pdep32(_ones_low(cut_star), sv_star)
    j = jnp.arange(32, dtype=jnp.uint32)[None, :]
    pa_star = ((am_star[:, None] >> j) & jnp.uint32(1)).astype(jnp.int32)
    T_star = jnp.where(
        has_star, jnp.int32(1) << jnp.clip(num_bp - 1 - pstar, 0, 30), 0
    )
    M = M_full + jnp.where(
        (star_avail > 0) & has_star, pa_star.reshape(-1) * T_star, 0
    )

    val = init + ((2 * A - M) >> 1) + last
    return jnp.where(sig, val, 0)[:n], overflow


__all__ = ["pdep32", "reconstruct_mags"]
