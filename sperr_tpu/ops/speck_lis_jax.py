"""Device-side LIS emission: the SPECK set walk as on-device sorts (JAX).

Completes the wavefront encoder: with codec/speck_sorted.py's total order
over tree nodes, every LIS bit has a static sort key, so the set-partition
walk — the last host-side piece of SPECK encoding — becomes per-pass
``jnp.lexsort`` + scatter-pack on the device.  Combined with the LIP /
refinement segments (ops/speck_jax.py), the whole entropy stage runs on
the TPU; the host only concatenates byte-aligned segments.

Everything is int32 (TPU-native; no x64 requirement): path keys are 24
five-bit digits packed into four 30-bit words.  Per-chunk work is bounded
by `node_cap` significant sets (the compressed-information scale); the
driver falls back to the host stitcher on overflow, exactly like the other
caps.

Key layout mirrors codec/speck_sorted.py (see its module docstring for the
order's derivation); here roots are pre-assigned their per-level insertion
ranks so root/born anchors share one O scale.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.speck_wave import build_tree
from ..codec.speck_sorted import sorted_tree

_NEVER = 0x7FFF
_BIG = np.int32(2**31 - 1)


class LisIndex:
    """Static device arrays for the on-device set walk (cached per dims)."""

    __slots__ = (
        "nn", "n", "nrows", "max_ch", "depth_max", "nlev", "nroots",
        "parent", "level", "depth", "pw",            # per node
        "ch_start", "ch_count", "ch_ref", "ch_is_px", "px_linear",
        "root_ids", "root_levels", "O0", "off0", "root_from",
    )

    def __init__(self, dims):
        tree = build_tree(tuple(int(d) for d in dims))
        st = sorted_tree(tree)
        nn = tree.node_ch_start.size
        self.nn = nn
        self.n = tree.n
        self.nrows = tree.ch_ref.size
        self.max_ch = int(tree.node_ch_count.max())
        self.depth_max = int(st.depth.max())
        lev = tree.node_level.astype(np.int32)
        self.nlev = int(lev.max()) + 1
        self.parent = jnp.asarray(st.parent.astype(np.int32))
        self.level = jnp.asarray(lev)
        self.depth = jnp.asarray(st.depth.astype(np.int32))
        # path digits (5 bits each, depth-indexed) re-packed from the host's
        # two 60-bit halves into four 30-bit words: digit d -> word d//6,
        # shift 5*(5 - d%6)
        hi, lo = st.path_hi, st.path_lo
        m30 = (1 << 30) - 1
        pw = np.stack(
            [(hi >> 30) & m30, hi & m30, (lo >> 30) & m30, lo & m30], axis=1
        ).astype(np.int32)
        self.pw = jnp.asarray(pw)
        self.ch_start = jnp.asarray(tree.node_ch_start.astype(np.int32))
        self.ch_count = jnp.asarray(tree.node_ch_count.astype(np.int32))
        self.ch_ref = jnp.asarray(tree.ch_ref.astype(np.int32))
        self.ch_is_px = jnp.asarray(tree.ch_is_pixel)
        self.px_linear = jnp.asarray(tree.px_linear.astype(np.int32))
        # roots: pre-assigned per-level insertion ranks (they sit in their
        # lists from pass 0, in root_ids order) — O and the per-level append
        # offsets start after them
        rids = tree.root_ids.astype(np.int32)
        rlev = tree.root_levels.astype(np.int32)
        self.nroots = rids.size
        O0 = np.zeros(nn, dtype=np.int32)
        off0 = np.zeros(self.nlev, dtype=np.int32)
        for r, L in zip(rids, rlev):
            O0[r] = off0[L]
            off0[L] += 1
        self.root_ids = jnp.asarray(rids)
        self.root_levels = jnp.asarray(rlev)
        self.O0 = jnp.asarray(O0)
        self.off0 = jnp.asarray(off0)
        self.root_from = jnp.zeros(rids.size, dtype=np.int32)


_LIS_INDEXES = {}


def lis_index(dims) -> LisIndex:
    key = tuple(int(d) for d in dims)
    li = _LIS_INDEXES.get(key)
    if li is None:
        li = LisIndex(key)
        _LIS_INDEXES[key] = li
    return li


def _row_path(li: LisIndex, q, rslot):
    """Child-slot path words: the parent's path with digit (slot+1) at the
    parent's depth."""
    dq = li.depth[q]
    word = dq // 6
    shift = 5 * (5 - dq % 6)
    dig = (rslot + 1) << shift
    pw = li.pw[q]  # [..., 4]
    out = []
    for k in range(4):
        out.append(pw[..., k] + jnp.where(word == k, dig, 0))
    return out


def lis_segments_device(
    node_s: jnp.ndarray,
    s_lin: jnp.ndarray,
    signs: jnp.ndarray,
    num_bp: jnp.ndarray,
    li: LisIndex,
    num_bp_cap: int,
    node_cap: int,
    ev_cap: int,
    cap_total: int,
):
    """All LIS bit segments on the device, event-form.

    Returns (buf u8[cap_total], counts i32[num_bp_cap], total_bytes i32,
    n_sig i32): `buf` is the byte-aligned concatenation of the per-pass
    segments (pass p occupies bytes [sum of earlier (counts+7)//8,
    +(counts[p]+7)//8)), bit-identical to
    codec.speck_sorted.lis_segments_sorted.  `ev_cap` bounds the total
    emitted-bit events (~ the LIS share of the stream); on overflow of the
    event or byte caps n_sig is raised past any node_cap so the driver
    falls back to the host stitcher."""
    nn = li.nn
    MC = li.max_ch
    C = node_cap
    n_sig = jnp.sum(node_s < _NEVER).astype(jnp.int32)

    # ---- significant sets (the partitioned parents), compacted ------------
    (sid,) = jnp.nonzero(node_s < _NEVER, size=C, fill_value=nn)
    svalid = sid < nn
    q = jnp.minimum(sid, nn - 1)                     # [C]
    cnt = jnp.where(svalid, li.ch_count[q], 0)       # [C]
    start = li.ch_start[q]
    slot = jnp.arange(MC, dtype=jnp.int32)
    rvalid = slot[None, :] < cnt[:, None]            # [C, MC]
    ridx = jnp.minimum(start[:, None] + slot[None, :], li.nrows - 1)
    ref = jnp.where(rvalid, li.ch_ref[ridx], 0)
    ispx = li.ch_is_px[ridx] & rvalid
    isnd = (~li.ch_is_px[ridx]) & rvalid
    rowpass = jnp.where(svalid, node_s[q], _NEVER)   # [C] = children's birth

    px = li.px_linear[jnp.where(ispx, ref, 0)]
    row_s = jnp.where(
        ispx, s_lin[px], jnp.where(isnd, node_s[jnp.where(isnd, ref, 0)], _NEVER)
    )
    row_sign = signs[px] & ispx

    sig_now = (row_s == rowpass[:, None]) & rvalid
    prev_any = jnp.cumsum(sig_now, axis=1) - sig_now
    last = slot[None, :] == cnt[:, None] - 1
    emitted = ((prev_any > 0) | ~last) & rvalid

    # ---- anchors (per parent; equals each row's `top` and each born
    # child's chain anchor) -------------------------------------------------
    bq = rowpass                                      # birth pass of the rows
    anchor = q
    for _ in range(li.depth_max + 1):
        pa = li.parent[anchor]
        move = (pa >= 0) & (node_s[jnp.maximum(pa, 0)] == bq) & svalid
        anchor = jnp.where(move, jnp.maximum(pa, 0), anchor)

    # ---- O: per-level insertion order of born nodes (roots pre-assigned) --
    R = C * MC
    bidf = jnp.where(isnd, ref, nn).reshape(R)        # born ids (nn = invalid)
    bnf = jnp.broadcast_to(rowpass[:, None], (C, MC)).reshape(R)
    anf = jnp.broadcast_to(anchor[:, None], (C, MC)).reshape(R)
    bornf = isnd.reshape(R)
    bidc = jnp.minimum(bidf, nn - 1)
    levf = li.level[bidc]
    pwf = li.pw[bidc]                                 # [R, 4]

    a_lev = -li.level[anf]
    nlev = li.nlev

    # Compact the BORN rows once: only they receive insertion ranks, and
    # they number at most min(all child slots, the node count) — at the
    # default exact cap (node_cap = node count) this shrinks the per-pass
    # rank sort from the C*MC child-slot grid to <= nn rows (8x less sort
    # work per pass).  If a reduced node_cap ever drops born rows, n_sig is
    # raised past the cap so the driver falls back to the host stitcher
    # instead of mis-ranking.
    CB = min(R, nn)
    n_born = jnp.sum(bornf).astype(jnp.int32)
    (bsel,) = jnp.nonzero(bornf, size=CB, fill_value=R)
    bok = bsel < R
    bs = jnp.minimum(bsel, R - 1)
    c_bid = jnp.where(bok, bidf[bs], nn)
    c_bn = jnp.where(bok, bnf[bs], _BIG)
    c_an = jnp.where(bok, anf[bs], nn)
    c_lev = levf[bs]
    c_alev = a_lev[bs]
    c_pw = pwf[bs]

    def bp_iter(bp, carry):
        O_buf, offs = carry
        m = bok & (c_bn == bp)
        a_ord = O_buf[c_an]
        lev_m = jnp.where(m, c_lev, _BIG)
        order = jnp.lexsort(
            (c_pw[:, 3], c_pw[:, 2], c_pw[:, 1], c_pw[:, 0], a_ord, c_alev,
             lev_m)
        )
        rankpos = jnp.zeros(CB, jnp.int32).at[order].set(
            jnp.arange(CB, dtype=jnp.int32)
        )
        counts = jnp.bincount(
            jnp.where(m, c_lev, nlev), length=nlev + 1
        ).astype(jnp.int32)[:nlev]
        lstarts = jnp.cumsum(counts) - counts
        o_val = offs[c_lev] + (rankpos - lstarts[c_lev])
        O_buf = O_buf.at[jnp.where(m, c_bid, nn)].set(o_val, mode="drop")
        return O_buf, offs + counts

    O_buf = jnp.concatenate([li.O0, jnp.zeros(1, jnp.int32)])
    # dynamic trip count: only the passes that exist assign insertion ranks
    O_buf, _ = jax.lax.fori_loop(
        0, jnp.minimum(num_bp, num_bp_cap).astype(jnp.int32), bp_iter,
        (O_buf, li.off0), unroll=False,
    )
    n_sig = jnp.maximum(n_sig, jnp.where(n_born > CB, _BIG, 0))

    # ---- w: global walk order over list entries (levels desc, O asc) ------
    nroots = li.nroots
    E = R + nroots
    ent_id = jnp.concatenate([bidf, li.root_ids])
    ent_ok = jnp.concatenate([bornf, jnp.ones(nroots, bool)])
    ent_lev = jnp.concatenate([levf, li.root_levels])
    ent_O = O_buf[jnp.minimum(ent_id, nn - 1)]
    worder = jnp.lexsort(
        (ent_O, -ent_lev, ~ent_ok)
    )  # valid first, levels desc, O asc
    w_sorted = jnp.arange(E, dtype=jnp.int32)
    w_of_ent = jnp.zeros(E, jnp.int32).at[worder].set(w_sorted)
    w_buf = (
        jnp.full(nn + 1, _BIG, jnp.int32)
        .at[jnp.where(ent_ok, ent_id, nn)]
        .set(w_of_ent, mode="drop")
    )

    ent_from = jnp.concatenate([bnf + 1, li.root_from])
    ent_s = node_s[jnp.minimum(ent_id, nn - 1)]
    ent_w = w_of_ent
    ent_pw = li.pw[jnp.minimum(ent_id, nn - 1)]

    # ---- per-row static keys ----------------------------------------------
    w_top = jnp.broadcast_to(w_buf[anchor][:, None], (C, MC)).reshape(R)
    rp0, rp1, rp2, rp3 = _row_path(
        li, jnp.broadcast_to(q[:, None], (C, MC)).reshape(R),
        jnp.broadcast_to(slot[None, :], (C, MC)).reshape(R),
    )
    rowpassf = jnp.broadcast_to(rowpass[:, None], (C, MC)).reshape(R)
    row_sf = row_s.reshape(R)
    sig_nowf = sig_now.reshape(R)
    emittedf = emitted.reshape(R)
    ispxf = ispx.reshape(R)
    row_signf = row_sign.reshape(R)

    # concatenated per-pass item arrays: entries ++ decisions ++ signs
    T = E + 2 * R
    kw_all = jnp.concatenate([ent_w, w_top, w_top])
    k0 = jnp.concatenate([ent_pw[:, 0], rp0, rp0])
    k1 = jnp.concatenate([ent_pw[:, 1], rp1, rp1])
    k2 = jnp.concatenate([ent_pw[:, 2], rp2, rp2])
    k3 = jnp.concatenate([ent_pw[:, 3], rp3, rp3])
    ks = jnp.concatenate(
        [jnp.zeros(E, jnp.int32), jnp.zeros(R, jnp.int32), jnp.ones(R, jnp.int32)]
    )

    # ------------------------------------------------------------------
    # Event expansion: emit every LIS bit as one EVENT instead of running a
    # masked O(T) compaction + scatter for each of num_bp_cap passes (TPU
    # scatters run at ~0.6 GB/s — the old loop was pass-count * T scatter
    # work).  Each item's emissions form a pass INTERVAL:
    #   entries:   one membership bit per pass in [from, s] (value s == p);
    #   decisions: a single bit at the children's birth pass;
    #   signs:     a single bit at the pixel's exposure==significance pass.
    # The pipeline is: one 6-key item sort (pass-independent emission keys),
    # interval expansion via the scatter-starts + running-max idiom, a
    # 2-key event sort by (pass, item rank), and ONE scatter of the event
    # bits into the byte-aligned concatenated segment buffer.  Total work
    # ~ sort(T) + sort(#bits) instead of num_bp_cap * scatter(T).
    # ------------------------------------------------------------------
    g_order = jnp.lexsort((ks, k3, k2, k1, k0, kw_all))
    is_ent = jnp.concatenate(
        [jnp.ones(E, bool), jnp.zeros(2 * R, bool)]
    )[g_order]
    is_dec = jnp.concatenate(
        [jnp.zeros(E, bool), jnp.ones(R, bool), jnp.zeros(R, bool)]
    )[g_order]
    emit_p = jnp.concatenate(
        [jnp.zeros(E, jnp.int32), rowpassf, rowpassf]
    )[g_order]
    ent_from_s = jnp.concatenate(
        [ent_from, jnp.zeros(2 * R, jnp.int32)]
    )[g_order]
    ent_s_s = jnp.concatenate([ent_s, jnp.zeros(2 * R, jnp.int32)])[g_order]
    ok_s = jnp.concatenate(
        [ent_ok, emittedf, ispxf & (row_sf == rowpassf)]
    )[g_order]
    bit1_s = jnp.concatenate(
        [jnp.zeros(E, bool), sig_nowf, row_signf]
    )[g_order]

    # per-item emission interval [lo, hi] clipped to the live passes
    lo = jnp.where(is_ent, ent_from_s, emit_p)
    hi = jnp.minimum(jnp.where(is_ent, ent_s_s, emit_p), num_bp - 1)
    ln = jnp.where(ok_s & (lo <= hi), hi - lo + 1, 0)

    EV = ev_cap
    off = jnp.cumsum(ln) - ln
    ev_total = jnp.sum(ln)
    # scatter each item's g-rank at its first event slot; the running max
    # recovers the source item for every event (off is nondecreasing in
    # g-rank, so scattered values increase along the event axis)
    src0 = jnp.full(EV, -1, jnp.int32).at[
        jnp.where(ln > 0, off, EV)
    ].set(jnp.arange(T, dtype=jnp.int32), mode="drop")
    src = jax.lax.associative_scan(jnp.maximum, src0)
    srcc = jnp.maximum(src, 0)
    j = jnp.arange(EV, dtype=jnp.int32)
    ev_ok = (j < ev_total) & (src >= 0)
    p_ev = lo[srcc] + (j - off[srcc])
    bit_ev = jnp.where(is_ent[srcc], ent_s_s[srcc] == p_ev, bit1_s[srcc])
    p_key = jnp.where(ev_ok, p_ev, _BIG)

    # order within a pass = item order (one event per item per pass), so a
    # 2-key sort by (pass, source rank) reproduces the per-pass sequences
    eorder = jnp.lexsort((srcc, p_key))
    p_sorted = p_key[eorder]
    bit_sorted = bit_ev[eorder]

    counts = jnp.bincount(
        jnp.where(ev_ok, p_ev, num_bp_cap), length=num_bp_cap + 1
    ).astype(jnp.int32)[:num_bp_cap]
    starts = jnp.cumsum(counts) - counts
    bc = (counts + 7) // 8
    boff = jnp.cumsum(bc) - bc
    total_bytes = jnp.sum(bc)

    cap_total_bits = cap_total * 8
    rank = jnp.arange(EV, dtype=jnp.int32)
    pcl = jnp.clip(p_sorted, 0, num_bp_cap - 1)
    pos = boff[pcl] * 8 + (rank - starts[pcl])
    valid_out = (p_sorted < num_bp_cap) & (pos < cap_total_bits)
    out01 = jnp.zeros(cap_total_bits, dtype=jnp.uint8)
    out01 = out01.at[jnp.where(valid_out, pos, cap_total_bits)].set(
        bit_sorted.astype(jnp.uint8), mode="drop"
    )
    w8 = out01.reshape(-1, 8).astype(jnp.uint32)
    powers = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=jnp.uint32)
    buf = (w8 @ powers).astype(jnp.uint8)

    # overflow (event cap or byte cap) -> force the host fallback
    n_sig = jnp.maximum(
        n_sig,
        jnp.where((ev_total > EV) | (total_bytes > cap_total), _BIG, 0),
    )
    return buf, counts, total_bytes, n_sig


__all__ = ["LisIndex", "lis_index", "lis_segments_device"]
