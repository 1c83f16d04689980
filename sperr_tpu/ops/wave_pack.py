"""Device SPECK emission via prefix-pack dense matrices (round-4 rebuild).

Replaces the event-list emission (ops/speck_jax.lip_events / ref_events /
events_to_segments_merged + the LIS interval expansion) with three dense
[pass, position] boolean matrices packed by ops/packemit.masked_pack:

  * LIP:        [P, 2n]  (decision, sign) cell pairs per pixel — a pixel
                emits a membership bit at every pass in (e, s] and its
                sign right after the decision that turns it significant
                (reference SPECK_INT.cpp:111-163 LIP walk);
  * LIS:        [P, 2T]  per walk-ordered item (entry membership bits /
                child-row decision + sign), straight from the set walk's
                sorted payload words (ops/speck_lis_jax.py);
  * refinement: [P, n]   magnitude bit (num_bp-1-p) for pixels with
                s < p (SPECK_INT.cpp:311-357).

Because SPECK's within-pass order is ascending position, row-major order
of each matrix IS stream order — the whole entropy stage needs no event
sort and no interval expansion; everything data-dependent runs at the
compressed-information scale inside masked_pack.  Output segments are
byte-aligned per (class, pass) row, class-major (all LIP passes, then
LIS, then refinement), byte-identical to the host engines after host
concatenation (parallel/batched.TpuCompressor3D._stitch_wave).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import packemit as pe

_NEVER = 0x7FFF


class WaveEmit(NamedTuple):
    num_bp: jnp.ndarray       # i32
    seg: jnp.ndarray          # u8[out_cap_bytes] packed class-major buffer
    counts: jnp.ndarray       # i32[3 * num_bp_cap] bit counts, class-major
    total_bytes: jnp.ndarray  # i32
    n_sig: jnp.ndarray        # i32 (poisoned past node_cap on overflow)
    overflow: jnp.ndarray     # bool (piece or byte cap exceeded)
    n_nz: jnp.ndarray         # i32 non-empty pieces (occupancy signal)


def _pad_cols(a: jnp.ndarray, cols: int, fill) -> jnp.ndarray:
    have = a.shape[-1]
    if have == cols:
        return a
    pad = jnp.full(a.shape[:-1] + (cols - have,), fill, a.dtype)
    return jnp.concatenate([a, pad], axis=-1)


def _pack_pair(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[P, L] u8 cell matrices -> [P, 2L//32] u32 words of the
    interleaved stream a0 b0 a1 b1 ... per row, via stride-2 selector
    matmuls — NEVER materializes a [..., 2]-minor array (which the TPU
    layout pads 64x; see ops/packemit.py's layout rule)."""
    P, L = a.shape
    w = pe.pack_cells_interleaved(a.reshape(-1), b.reshape(-1))
    return w.reshape(P, 2 * L // 32)


def _pack_one(a: jnp.ndarray) -> jnp.ndarray:
    P, L = a.shape
    return pe.pack_cells_flat(a.reshape(-1)).reshape(P, L // 32)


def wave_emit_3d(
    mags: jnp.ndarray,
    signs: jnp.ndarray,
    s: jnp.ndarray,
    e: jnp.ndarray,
    node_s: jnp.ndarray,
    num_bp: jnp.ndarray,
    li,
    num_bp_cap: int,
    node_cap: int,
    evb_cap: int,
    out_cap_bytes: int,
    wexp_cap: int = 0,
) -> WaveEmit:
    """Full SPECK bit emission for one chunk, prefix-pack form.

    Inputs are the per-pixel schedule (s, e from pixel_schedule*), the
    per-node significance passes (node_s), and the walk index ``li``
    (LisIndex / VirtualLisIndex).  All shapes static except data.

    ``wexp_cap`` > 0 compacts the EXPOSED pixels (e < num_bp — the only
    ones that ever emit LIP or refinement bits) before building the
    emission matrices: one flat 3-operand sort in ascending-index
    (emission) order shrinks the [P, n]-scale matrices to the exposed
    neighborhood (~2-6% of n at production tolerance on 256^3 chunks).
    Exposure overflow sets the overflow flag (tier retry).
    """
    from .speck_lis_jax import lis_segments_device

    n = mags.shape[0]
    P = num_bp_cap
    pidx = jnp.arange(P, dtype=jnp.int32)[:, None]

    # --- LIS items: the set walk, stopping at the walk-ordered payloads --
    pay_s, n_sig = lis_segments_device(
        node_s, s, signs, num_bp, li, num_bp_cap, node_cap,
        ev_cap=0, cap_total=0, return_events="items",
    )
    T = pay_s.shape[0]
    Tp = -(-T // 128) * 128
    pay_p = _pad_cols(pay_s[None, :], Tp, 0)[0]

    is_ent = (pay_p & 1) == 1
    lo = (pay_p >> 1) & 63
    s6 = (pay_p >> 7) & 63
    sgn_i = ((pay_p >> 13) & 1).astype(jnp.uint8)
    signow = ((pay_p >> 14) & 1).astype(jnp.uint8)
    hs = (pay_p >> 15) & 1
    dec = (pay_p >> 16) & 1
    ok = (pay_p >> 17) & 1

    ent_hi = jnp.minimum(s6, num_bp - 1)
    ent_valid = (
        is_ent[None, :] & (ok == 1)[None, :]
        & (lo[None, :] <= pidx) & (pidx <= ent_hi[None, :])
    )
    row_at = (~is_ent)[None, :] & (lo[None, :] == pidx)
    dec_valid = row_at & (dec == 1)[None, :]
    sign_valid = row_at & (hs == 1)[None, :]
    lis_v0 = (ent_valid | dec_valid).astype(jnp.uint8)
    lis_b0 = jnp.where(
        is_ent[None, :], (s6[None, :] == pidx), (signow == 1)[None, :]
    ).astype(jnp.uint8)
    lis_v1 = sign_valid.astype(jnp.uint8)
    lis_b1 = jnp.broadcast_to(sgn_i[None, :], (P, Tp))

    # --- exposed-pixel compaction (optional) ------------------------------
    exp_over = jnp.zeros((), bool)
    if wexp_cap and wexp_cap < n:
        exposed = e < num_bp
        key = jnp.where(exposed, jnp.arange(n, dtype=jnp.int32), n)
        pay = (
            jnp.clip(s, 0, 127)
            | (jnp.clip(e, 0, 127) << 7)
            | (signs.astype(jnp.int32) << 14)
        )
        _, pay_c, mag_c = jax.lax.sort(
            (key, pay, mags.astype(jnp.int32)), num_keys=1, is_stable=False
        )
        n_exp = jnp.sum(exposed)
        exp_over = n_exp > wexp_cap
        # 256-cell padding: every part's word count must be a multiple
        # of masked_pack's piece_words (the ref part is npad/32 words)
        npad = -(-wexp_cap // 256) * 256
        okm = jnp.arange(npad, dtype=jnp.int32) < n_exp
        pc = _pad_cols(pay_c[None, :wexp_cap], npad, 0)[0]
        s_p = jnp.where(okm, pc & 127, _NEVER)
        e_p = jnp.where(okm, (pc >> 7) & 127, _NEVER)
        g_p = jnp.where(okm, (pc >> 14) & 1, 0).astype(jnp.uint8)
        m_p = jnp.where(
            okm, _pad_cols(mag_c[None, :wexp_cap], npad, 0)[0], 0
        )
    else:
        npad = -(-n // 256) * 256
        s_p = _pad_cols(s[None, :], npad, _NEVER)[0]
        e_p = _pad_cols(e[None, :], npad, _NEVER)[0]
        g_p = _pad_cols(signs[None, :].astype(jnp.uint8), npad, 0)[0]
        m_p = _pad_cols(mags.astype(jnp.int32)[None, :], npad, 0)[0]

    # --- LIP matrices [P, 2*npad] (interleaved decision, sign cells) -----

    exposed = e_p[None, :] < pidx
    dec_v = (
        exposed & (pidx <= s_p[None, :]) & (pidx <= num_bp - 1)
    ).astype(jnp.uint8)
    dec_b = (s_p[None, :] == pidx).astype(jnp.uint8)
    sign_v = (exposed & (s_p[None, :] == pidx)).astype(jnp.uint8)
    sign_b = jnp.broadcast_to(g_p[None, :], (P, npad))

    # --- refinement matrices [P, n] --------------------------------------
    ref_v = ((s_p[None, :] < pidx) & (pidx <= num_bp - 1)).astype(jnp.uint8)
    shift = jnp.clip(num_bp - 1 - pidx, 0, 31).astype(jnp.uint32)
    ref_b = (
        (m_p[None, :].astype(jnp.uint32) >> shift) & jnp.uint32(1)
    ).astype(jnp.uint8)

    parts = [
        (_pack_pair(dec_v, sign_v), _pack_pair(dec_b, sign_b)),
        (_pack_pair(lis_v0, lis_v1), _pack_pair(lis_b0, lis_b1)),
        (_pack_one(ref_v), _pack_one(ref_b)),
    ]
    res = pe.masked_pack(parts, evb_cap, out_cap_bytes)
    seg = pe.words_to_bytes(res.out_words)
    return WaveEmit(
        num_bp.astype(jnp.int32), seg, res.counts, res.total_bytes,
        n_sig, res.overflow | exp_over, res.n_nz,
    )


__all__ = ["wave_emit_3d", "WaveEmit"]
