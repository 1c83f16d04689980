"""Device-side 2D LIS emission: quad partitions + the QccPack I-set.

Extends the 3D event-form walk (ops/speck_lis_jax.py) to the 2D tree
(codec/speck_wave.Tree2): the quad/I-set recursion of the reference
(SPECK2D_INT.cpp:11-185) becomes one payload-carrying sort + interval
expansion + one pass sort on the device, byte-identical to
codec/speck_sorted.lis_segments_sorted_2d.

The 2D-specific structure rides the same machinery as three extra item
classes with *computed sort ranks* after all level-walk items:

  * pending I(k) membership bits — an ENTRY item with from = birth(I(k))
    (+1 when the cascade implies the birth bit) and s = iset_s[k];
  * the group-arrival bits of a partitioned I(k) — ROW items, one bit at
    pass iset_s[k] with value (s[group] == pass);
  * the rows of an immediately-partitioned group (the host emitter's
    `icrit` blocks) — normal rows re-keyed into the I item space.

Item order within the I space follows the serial recursion: for k = xf
down to 1, [pending-I(k) bit][group bit, group block] x3, encoded as the
static rank 8*(xf-k) + {0; 1+2j; 2+2j}.  Everything else — birth/anchor
chains, the transitive anchor ranks (levels, births, anchor classes,
one insertion-rank sort), walk order, pixel signs riding their rows —
is the 3D design with two more anchor classes (the walk root sorts
first, group anchors sort last by their static I-event rank, reference
QccPack appends I after all level lists)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.speck_wave import build_tree2
from ..codec.speck_sorted import sorted_tree

_NEVER = 0x7FFF
_BIG = np.int32(2**31 - 1)


class Lis2Index:
    """Static device arrays for the on-device 2D set walk (cached)."""

    __slots__ = (
        "nn", "n", "nrows", "max_ch", "depth_max", "nlev", "xf", "G",
        "parent", "level", "depth", "pw",
        "ch_start", "ch_count", "ctab",
        "is_group", "k_of", "irank_of", "block_rank_of",
        "group_ids", "group_k", "gbit_rank", "gsel",
    )

    def __init__(self, dims):
        tree = build_tree2((int(dims[0]), int(dims[1])))
        st = sorted_tree(tree)
        nn = tree.node_ch_start.size
        self.nn = nn
        self.n = tree.n
        self.nrows = tree.ch_ref.size
        self.max_ch = int(tree.node_ch_count.max())
        self.depth_max = int(st.depth.max())
        self.xf = int(tree.xf)
        lev = tree.node_level.astype(np.int32)
        self.nlev = int(lev.max()) + 1
        self.parent = jnp.asarray(st.parent.astype(np.int32))
        self.level = jnp.asarray(lev)
        self.depth = jnp.asarray(st.depth.astype(np.int32))
        hi, lo = st.path_hi, st.path_lo
        m30 = (1 << 30) - 1
        pw = np.stack(
            [(hi >> 30) & m30, hi & m30, (lo >> 30) & m30, lo & m30], axis=1
        ).astype(np.int32)
        self.pw = jnp.asarray(pw)
        self.ch_start = jnp.asarray(tree.node_ch_start.astype(np.int32))
        self.ch_count = jnp.asarray(tree.node_ch_count.astype(np.int32))
        refs = tree.ch_ref
        ispx = tree.ch_is_pixel
        resolved = np.where(
            ispx, tree.px_linear[np.where(ispx, refs, 0)], tree.n + refs
        ).astype(np.int64)
        self.ctab = jnp.asarray(
            ((resolved << 1) | ispx.astype(np.int64)).astype(np.int32)
        )

        # group metadata in global event order (k = xf..1, slot order)
        gids, gks, granks, blk_ranks, gbit_ranks = [], [], [], [], []
        r = 0
        for k in range(self.xf, 0, -1):
            for j, nid in enumerate(tree.iset_groups[k]):
                gids.append(int(nid))
                gks.append(k)
                granks.append(r)
                gbit_ranks.append(8 * (self.xf - k) + 1 + 2 * j)
                blk_ranks.append(8 * (self.xf - k) + 2 + 2 * j)
                r += 1
        self.G = len(gids)
        is_group = np.zeros(nn, dtype=bool)
        k_of = np.zeros(nn, dtype=np.int32)
        irank_of = np.zeros(nn, dtype=np.int32)
        block_rank_of = np.zeros(nn, dtype=np.int32)
        for g, k, rr, br in zip(gids, gks, granks, blk_ranks):
            is_group[g] = True
            k_of[g] = k
            irank_of[g] = rr
            block_rank_of[g] = br
        self.is_group = jnp.asarray(is_group)
        self.k_of = jnp.asarray(k_of)
        self.irank_of = jnp.asarray(irank_of)
        self.block_rank_of = jnp.asarray(block_rank_of)
        self.group_ids = jnp.asarray(np.asarray(gids, dtype=np.int32))
        self.group_k = jnp.asarray(np.asarray(gks, dtype=np.int32))
        self.gbit_rank = jnp.asarray(np.asarray(gbit_ranks, dtype=np.int32))
        # gsel[k] = boolean over groups of "belongs to level k" (tiny, for
        # the cascade-implied-omission any() per level)
        gsel = np.zeros((self.xf + 2, max(self.G, 1)), dtype=bool)
        for i, k in enumerate(gks):
            gsel[k, i] = True
        self.gsel = jnp.asarray(gsel)


_LIS2_INDEXES: Dict[Tuple[int, int], Lis2Index] = {}


def lis2_index(dims) -> Lis2Index:
    key = (int(dims[0]), int(dims[1]))
    li = _LIS2_INDEXES.get(key)
    if li is None:
        li = Lis2Index(key)
        _LIS2_INDEXES[key] = li
    return li


def iset_significance_device(pm2d: jnp.ndarray, tree, num_bp):
    """iset_s[k] for k = 0..xf from the per-pixel msb+1 map: the pass at
    which the level-k I region (everything outside corner (ax_k, ay_k))
    becomes significant; index 0 unused (= NEVER).  Static slice shapes —
    xf tiny reductions."""
    ny, nx = pm2d.shape
    vals = [jnp.int32(_NEVER)]
    for k in range(1, tree.xf + 1):
        ax, ay = tree.iset_regions[k]
        m = jnp.int32(0)
        if ay < ny:
            m = jnp.maximum(m, jnp.max(pm2d[ay:, :]).astype(jnp.int32))
        if ax < nx and ay > 0:
            m = jnp.maximum(m, jnp.max(pm2d[:ay, ax:]).astype(jnp.int32))
        vals.append(
            jnp.where(m > 0, num_bp - m, _NEVER).astype(jnp.int32)
        )
    return jnp.stack(vals)


def lis2_segments_device(
    node_s: jnp.ndarray,
    s_lin: jnp.ndarray,
    signs: jnp.ndarray,
    num_bp: jnp.ndarray,
    iset_s: jnp.ndarray,
    li: Lis2Index,
    num_bp_cap: int,
    node_cap: int,
    ev_cap: int,
    cap_total: int,
):
    """All 2D LIS bit segments on the device, event-form.

    Returns (buf u8[cap_total], counts i32[num_bp_cap], total_bytes i32,
    n_sig i32), with buf the byte-aligned concatenation of the per-pass
    segments, bit-identical to codec.speck_sorted.lis_segments_sorted_2d.
    On event/byte-cap overflow n_sig is raised past any node_cap so the
    driver falls back to the host stitcher."""
    from .speck_jax import _expand_fill, events_to_segments

    nn = li.nn
    MC = li.max_ch
    C = node_cap
    xf = li.xf
    G = li.G
    n_sig = jnp.sum(node_s < _NEVER).astype(jnp.int32)

    # ---- significant sets (partitioned parents), compacted ----------------
    # sort compaction: the key IS the node id (see the 3D walk)
    sig_key = jnp.where(
        node_s < _NEVER, jnp.arange(nn, dtype=jnp.int32), nn
    )
    (sid_s,) = jax.lax.sort((sig_key,), num_keys=1, is_stable=False)
    if C > nn:  # caps may exceed the node count; pad with invalid ids
        sid_s = jnp.concatenate(
            [sid_s, jnp.full(C - nn, nn, jnp.int32)]
        )
    sid = sid_s[:C]
    svalid = sid < nn
    q = jnp.minimum(sid, nn - 1)
    slot = jnp.arange(MC, dtype=jnp.int32)
    cnt = jnp.where(svalid, li.ch_count[q], 0)
    rvalid = slot[None, :] < cnt[:, None]
    ridx = jnp.minimum(li.ch_start[q][:, None] + slot[None, :], li.nrows - 1)
    crow = li.ctab[ridx]
    ispx = ((crow & 1) == 1) & rvalid
    isnd = ((crow & 1) == 0) & rvalid
    vidx = crow >> 1
    rowpass = jnp.where(svalid, node_s[q], _NEVER)

    sval = jnp.concatenate(
        [s_lin | (signs.astype(jnp.int32) << 15), node_s]
    )
    v = sval[jnp.where(rvalid, vidx, 0)]
    row_s = jnp.where(rvalid, v & _NEVER, _NEVER)
    row_sign = ((v >> 15) & 1) == 1

    sig_now = (row_s == rowpass[:, None]) & rvalid
    prev_any = jnp.cumsum(sig_now, axis=1) - sig_now
    last = slot[None, :] == cnt[:, None] - 1
    emitted = ((prev_any > 0) | ~last) & rvalid

    # ---- anchors + transitive anchor ranks --------------------------------
    # Same-pass parent pointer per node, pointer-doubled to the chain
    # fixpoint (the 3D walk's construction, speck_lis_jax.py); the rows'
    # anchors are then one gather.
    ids = jnp.arange(nn, dtype=jnp.int32)
    par = li.parent[ids]
    has_par = par >= 0
    par_c = jnp.maximum(par, 0)
    J = jnp.where(has_par & (node_s[par_c] == node_s), par_c, ids)
    for _ in range(max(1, (li.depth_max + 2).bit_length())):
        J = J[J]
    anchor = jnp.where(svalid, J[q], q)

    # Transitive anchor RANKS: O(z) within a level ranks by (bn, aclass,
    # a_born, O(anchor(z)), path), so the recursion unrolls along the
    # anchor chain z -> anchor(z) -> ... into the lexicographic order of
    # the chain's hop words followed by path(x) (prefix argument: every
    # path(a_i) is a prefix of path(x) and same-slot anchors share a
    # level).  The 2D-specific classes become TERMINAL hop words — the
    # walk root (a_ord 0), root-anchored nodes (a_ord 0), and
    # group-critical anchors (static I-rank t) — and (aclass, a_born)
    # inside the word decide termination, so compared chains always end
    # together.  Strings are ranked by suffix-array doubling; the final
    # insertion order then needs ONE sort (below) instead of the old
    # depth_max+2 refinement sweeps.
    bn_n = jnp.where(
        li.is_group,
        iset_s[jnp.clip(li.k_of, 0, xf)],
        jnp.where(has_par, node_s[par_c], 0),
    )
    ar_n = jnp.where(li.is_group | ~has_par, ids, J[par_c])
    ar_grp_n = li.is_group[ar_n]
    g_anc_n = ar_grp_n & (
        (ids == ar_n)
        | (iset_s[jnp.clip(li.k_of[ar_n], 0, xf)] == node_s[ar_n])
    )
    root_self_n = ids == 0
    root_anc_n = (ar_n == 0) & ~root_self_n
    aclass_n = jnp.where(
        root_self_n,
        0,
        jnp.where(
            g_anc_n, 127, 1 + (63 - jnp.clip(li.level[ar_n], 0, 63))
        ),
    )
    a_born_n = jnp.where(root_self_n | root_anc_n, 0, 1)
    term_n = root_self_n | root_anc_n | g_anc_n | ~has_par
    t_n = jnp.where(g_anc_n, jnp.clip(li.irank_of[ar_n], 0, 2047), 0)
    w_n = jnp.where(
        root_self_n,
        0,
        (1 << 25)
        | (jnp.clip(bn_n, 0, 63) << 19)
        | (aclass_n << 12)
        | (a_born_n << 11)
        | t_n,
    )
    nxt = jnp.concatenate(
        [jnp.where(term_n, nn, ar_n), jnp.full(1, nn, jnp.int32)]
    )
    R_rank = jnp.concatenate([w_n, jnp.zeros(1, jnp.int32)])
    iota_n1 = jnp.arange(nn + 1, dtype=jnp.int32)
    for _ in range(max(1, (li.depth_max + 2).bit_length())):
        r1s, r2s, idx_s = jax.lax.sort(
            (R_rank, R_rank[nxt], iota_n1), num_keys=2, is_stable=False
        )
        diff = jnp.concatenate(
            [
                jnp.zeros(1, jnp.int32),
                ((r1s[1:] != r1s[:-1]) | (r2s[1:] != r2s[:-1])).astype(
                    jnp.int32
                ),
            ]
        )
        R_rank = jnp.zeros(nn + 1, jnp.int32).at[idx_s].set(jnp.cumsum(diff))
        nxt = nxt[nxt]

    # immediate-I blocks: the chain anchor is a group partitioned at its
    # own birth (b_group == s_group); their rows move to the I item space
    anc_grp = li.is_group[anchor] & svalid
    b_anc = iset_s[jnp.clip(li.k_of[anchor], 0, xf)]
    icritq = anc_grp & (b_anc == node_s[anchor])

    # ---- entry candidates: born children ++ walk root ++ groups -----------
    R = C * MC
    bidf = jnp.where(isnd, vidx - li.n, nn).reshape(R)
    bnf = jnp.broadcast_to(rowpass[:, None], (C, MC)).reshape(R)
    anf = jnp.broadcast_to(anchor[:, None], (C, MC)).reshape(R)
    bornf = isnd.reshape(R)

    CB = min(R, nn)
    n_born = jnp.sum(bornf).astype(jnp.int32)
    # payload-carrying sort compaction of the born rows (id, birth, anchor)
    bkey = jnp.where(bornf, jnp.arange(R, dtype=jnp.int32), R)
    bkey_s, bid_s, bn_s, an_s = jax.lax.sort(
        (bkey, bidf, bnf, anf), num_keys=1, is_stable=False
    )
    bok = bkey_s[:CB] < R
    c_bid = jnp.where(bok, bid_s[:CB], nn)
    c_bn = jnp.where(bok, bn_s[:CB], _BIG)
    c_an = jnp.where(bok, an_s[:CB], nn)

    # injected: the walk root (id 0, birth 0) and the G group heads
    # (birth iset_s[k]; invalid when the region never partitions)
    g_bn = iset_s[jnp.clip(li.group_k, 0, xf)] if G else jnp.zeros(0, jnp.int32)
    g_ok = (g_bn < _NEVER) if G else jnp.zeros(0, bool)
    inj_id = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), li.group_ids]
    )
    inj_bn = jnp.concatenate([jnp.zeros(1, jnp.int32), g_bn])
    inj_ok = jnp.concatenate([jnp.ones(1, bool), g_ok])
    c_bid = jnp.concatenate([c_bid, jnp.where(inj_ok, inj_id, nn)])
    c_bn = jnp.concatenate([c_bn, jnp.where(inj_ok, inj_bn, _BIG)])
    c_an = jnp.concatenate([c_an, jnp.where(inj_ok, inj_id, nn)])
    bok = jnp.concatenate([bok, inj_ok])
    CB2 = CB + 1 + G

    bidc = jnp.minimum(c_bid, nn - 1)
    c_lev = li.level[bidc]
    c_pw = li.pw[bidc]  # [CB2, 4]
    ar = jnp.minimum(c_an, nn - 1)

    # anchor classes (host a_lev order: ROOT_FIRST < -lev < I_CLASS):
    # 0 = the node IS the walk root; 1.. = level anchors finer-first;
    # 127 = group anchors (the I recursion appends after all level walks)
    ar_grp = li.is_group[ar]
    g_anc = ar_grp & (
        (c_bid == c_an)
        | (iset_s[jnp.clip(li.k_of[ar], 0, xf)] == node_s[ar])
    )
    root_self = c_bid == 0
    root_anc = (c_an == 0) & ~root_self
    aclass = jnp.where(
        root_self, 0, jnp.where(g_anc, 127, 1 + (63 - jnp.clip(li.level[ar], 0, 63)))
    )
    a_born = jnp.where(root_self | root_anc, 0, 1)
    k_lba = jnp.where(
        bok,
        (c_lev << 20)
        | (jnp.clip(c_bn, 0, 63) << 14)
        | (aclass << 7)
        | (a_born << 6),
        _BIG,
    )
    counts_lev = jnp.bincount(
        jnp.where(bok, c_lev, li.nlev), length=li.nlev + 1
    ).astype(jnp.int32)[: li.nlev]
    lstarts = jnp.cumsum(counts_lev) - counts_lev
    iota_cb = jnp.arange(CB2, dtype=jnp.int32)

    # Insertion ranks in ONE sort: R_rank already encodes the whole
    # O(anchor) recursion; the terminal classes keep their static values
    # (consistent — (aclass, a_born) in k_lba separates the classes, so
    # R_rank values only ever compare against other R_rank values).
    a_ord = jnp.where(
        g_anc,
        li.irank_of[ar],
        jnp.where(
            root_self | root_anc, 0, R_rank[jnp.minimum(c_an, nn)]
        ),
    )
    ops_o = (k_lba, a_ord, c_pw[:, 0], c_pw[:, 1], c_pw[:, 2],
             c_pw[:, 3], iota_cb)
    out_o = jax.lax.sort(ops_o, num_keys=len(ops_o) - 1, is_stable=False)
    rankpos = jnp.zeros(CB2, jnp.int32).at[out_o[-1]].set(iota_cb)
    o_val = rankpos - lstarts[jnp.clip(c_lev, 0, li.nlev - 1)]
    O_buf = (
        jnp.zeros(nn + 1, jnp.int32)
        .at[jnp.where(bok, c_bid, nn)]
        .set(o_val, mode="drop")
    )
    n_sig = jnp.maximum(n_sig, jnp.where(n_born > CB, _BIG, 0))

    # ---- walk order over entries (levels desc, O asc) ---------------------
    E = CB2
    ent_idc = bidc
    worder = jnp.lexsort((O_buf[ent_idc], -c_lev, ~bok))
    w_sorted = jnp.arange(E, dtype=jnp.int32)
    w_of_ent = jnp.zeros(E, jnp.int32).at[worder].set(w_sorted)
    w_buf = (
        jnp.full(nn + 1, _BIG, jnp.int32)
        .at[jnp.where(bok, c_bid, nn)]
        .set(w_of_ent, mode="drop")
    )

    ent_from = jnp.where(root_self, 0, c_bn + 1)
    ent_s = node_s[ent_idc]

    # ---- per-row static keys ----------------------------------------------
    WBASE = E  # I item space starts after every possible walk order
    w_top = w_buf[anchor]
    kw_row1 = jnp.where(
        icritq, WBASE + li.block_rank_of[anchor], w_top
    )
    kw_rowf = jnp.broadcast_to(kw_row1[:, None], (C, MC)).reshape(R)
    dq = li.depth[q]
    word = dq // 6
    shift = 5 * (5 - dq % 6)
    rp_list = []
    for k in range(4):
        dig = (slot[None, :] + 1) << shift[:, None]
        rp_list.append(
            (li.pw[q][:, k : k + 1]
             + jnp.where(word[:, None] == k, dig, 0)).reshape(R)
        )
    rowpassf = jnp.broadcast_to(rowpass[:, None], (C, MC)).reshape(R)
    sig_nowf = sig_now.reshape(R)
    emittedf = emitted.reshape(R)
    ispxf = ispx.reshape(R)
    row_signf = (row_sign & ispx).reshape(R)

    # ---- I items: xf pending-I entries + G group-bit rows -----------------
    # cascade-implied omission: I(k)'s birth bit is skipped iff every group
    # of level k+1 was insignificant at the shared partition pass
    if G:
        g_sig_birth = node_s[li.group_ids] == g_bn
        lvl_any = jnp.any(
            li.gsel[:, :G] & g_sig_birth[None, :], axis=1
        )  # [xf+2]
    else:
        lvl_any = jnp.zeros(xf + 2, bool)
    ks = np.arange(xf, 0, -1, dtype=np.int32)  # k = xf..1
    if xf:
        k_j = jnp.asarray(ks)
        birth = jnp.where(k_j == xf, 0, iset_s[jnp.minimum(k_j + 1, xf)])
        omit = jnp.where(
            (k_j < xf) & ~lvl_any[jnp.minimum(k_j + 1, xf + 1)], 1, 0
        )
        pend_lo = birth + omit
        pend_ok = birth < _NEVER
        pend_s = iset_s[k_j]
        pend_kw = WBASE + 8 * (xf - k_j)
        pend_pw = jnp.zeros((xf, 4), jnp.int32)
        gpass = iset_s[jnp.clip(li.group_k, 0, xf)]
        gbit_kw = WBASE + li.gbit_rank
        gbit_dec = gpass < num_bp
        gbit_sig = node_s[li.group_ids] == gpass
    # ------------------------------------------------------------------
    # Unified emission items (payload layout shared with the 3D walk):
    # 0 is_ent | 1-6 lo | 7-12 s | 13 sign | 14 sig_now | 15 has_sign |
    # 16 dec_emitted | 17 ok.
    # ------------------------------------------------------------------
    ent_lo = jnp.clip(ent_from, 0, 63)
    ent_s6 = jnp.clip(ent_s, 0, 63)
    pay_ent = (
        1 | (ent_lo << 1) | (ent_s6 << 7) | (bok.astype(jnp.int32) << 17)
    )
    row_hs = ispxf & sig_nowf
    pay_row = (
        (jnp.clip(rowpassf, 0, 63) << 1)
        | (row_signf.astype(jnp.int32) << 13)
        | (sig_nowf.astype(jnp.int32) << 14)
        | (row_hs.astype(jnp.int32) << 15)
        | (emittedf.astype(jnp.int32) << 16)
    )
    kw_parts = [w_of_ent, kw_rowf]
    pw_parts = [[c_pw[:, k], rp_list[k]] for k in range(4)]
    pay_parts = [pay_ent, pay_row]
    if xf:
        pay_pend = (
            1
            | (jnp.clip(pend_lo, 0, 63) << 1)
            | (jnp.clip(pend_s, 0, 63) << 7)
            | ((pend_ok & (pend_lo < num_bp)).astype(jnp.int32) << 17)
        )
        pay_gbit = (
            (jnp.clip(gpass, 0, 63) << 1)
            | (gbit_sig.astype(jnp.int32) << 14)
            | (gbit_dec.astype(jnp.int32) << 16)
        )
        kw_parts += [pend_kw, gbit_kw]
        for k in range(4):
            pw_parts[k] += [pend_pw[:, k], jnp.zeros(G, jnp.int32)]
        pay_parts += [pay_pend, pay_gbit]
    kw_all = jnp.concatenate(kw_parts)
    kpath = [jnp.concatenate(p) for p in pw_parts]
    pay = jnp.concatenate(pay_parts)

    ops = (kw_all, *kpath, pay)
    out = jax.lax.sort(ops, num_keys=len(ops) - 1, is_stable=False)
    pay_s = out[-1]

    is_ent_s = (pay_s & 1) == 1
    lo_s = (pay_s >> 1) & 63
    s6_s = (pay_s >> 7) & 63
    hs_s = (pay_s >> 15) & 1
    dec_s = (pay_s >> 16) & 1
    ok_s = (pay_s >> 17) & 1
    ent_hi = jnp.minimum(s6_s, num_bp - 1)
    ln = jnp.where(
        is_ent_s,
        jnp.where((ok_s == 1) & (lo_s <= ent_hi), ent_hi - lo_s + 1, 0),
        dec_s + hs_s,
    )

    (payf,), rel, ev_ok, ev_total = _expand_fill(
        ln, [pay_s], ev_cap, widths=[18]
    )
    is_ent_f = (payf & 1) == 1
    lo_f = (payf >> 1) & 63
    s6_f = (payf >> 7) & 63
    sign_f = (payf >> 13) & 1
    signow_f = (payf >> 14) & 1
    dec_f = (payf >> 16) & 1
    p_ev = jnp.where(is_ent_f, lo_f + rel, lo_f)
    is_sign_ev = (~is_ent_f) & (rel == dec_f)
    bit_ev = jnp.where(
        is_ent_f,
        s6_f == p_ev,
        jnp.where(is_sign_ev, sign_f == 1, signow_f == 1),
    )
    p_key = jnp.where(ev_ok, p_ev, num_bp_cap)
    buf, counts, total_bytes = events_to_segments(
        p_key, None, bit_ev, num_bp_cap, cap_total
    )

    n_sig = jnp.maximum(
        n_sig,
        jnp.where((ev_total > ev_cap) | (total_bytes > cap_total), _BIG, 0),
    )
    return buf, counts, total_bytes, n_sig


__all__ = [
    "Lis2Index", "lis2_index", "lis2_segments_device",
    "iset_significance_device",
]
