"""Fully-sorted SPECK emission: the LIS set walk as a lexicographic sort.

Completes the wavefront decomposition (docs/ROADMAP.md #2): the serial
coder's list-insertion order is a *computable total order* over tree nodes —

    O(n) within its level = lex( birth pass b(n),
                                 anchor level (finer first),
                                 O(anchor),
                                 child-index path from the anchor )

where b(n) = partition pass of the parent, and the anchor is the first
strict ancestor with a smaller birth pass (or the chain's root; roots order
by their initial index).  Verified empirically against the simulation on
hundreds of (pass, level) snapshots before being adopted.

With O in hand, every LIS bit has a sort key:

  * list-entry decisions at pass p (members b < p <= s, roots from p = 0):
    key (walk order w = (level desc, O), own path, 0) — value (s == p);
  * partition-block bits (children of nodes partitioned at p, the code_s
    recursion): key (w of the top-level list anchor, root-path of the child
    slot, decision/sign), with the sibling skip rule computed by prefix-or.

Shared root-path prefixes make path keys comparable within an anchor group,
so one static path key per node/pixel serves every pass.  One lexsort per
pass then yields the exact serial bit sequence — no recursion anywhere.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .speck_wave import _NEVER, Tree


class SortedTree:
    """Static arrays for the sorted emission (cached per dims alongside the
    Tree): parents, child slots, packed root-paths, per-pixel rows."""

    __slots__ = (
        "parent", "slot", "depth", "path_hi", "path_lo",
        "row_parent", "row_slot", "row_is_px", "row_ref",
        "row_path_hi", "row_path_lo", "root_rank",
    )


_SORTED: Dict[Tuple[int, int, int], SortedTree] = {}


def _pack_paths(depth: np.ndarray, parent: np.ndarray, slot: np.ndarray, tree):
    """Root-path keys: digits (slot+1) at fixed positions, zero-padded below
    the node's depth so a node's key sorts before its descendants'."""
    nn = parent.size
    maxd = int(depth.max()) + 2
    assert maxd <= 24, "path packing supports depth <= 24"
    digits = np.zeros((nn, maxd), dtype=np.int8)
    for lo_, hi_ in tree.node_depth_ranges:  # parents resolve earlier
        par = parent[lo_:hi_]
        ok = par >= 0
        rows = np.arange(lo_, hi_)[ok]
        digits[rows] = digits[par[ok]]
        digits[rows, depth[rows] - 1] = (slot[rows] + 1).astype(np.int8)
    hi = np.zeros(nn, dtype=np.int64)
    lo = np.zeros(nn, dtype=np.int64)
    for i in range(maxd):
        col = digits[:, i].astype(np.int64)
        if i < 12:
            hi = (hi << 5) | col
        else:
            lo = (lo << 5) | col
    hi <<= 5 * max(0, 12 - maxd)
    if maxd > 12:
        lo <<= 5 * max(0, 24 - maxd)
    else:
        lo[:] = 0
    return hi, lo, digits, maxd


def sorted_tree(tree: Tree) -> SortedTree:
    key = tree.dims
    st = _SORTED.get(key)
    if st is not None:
        return st
    nn = tree.node_ch_start.size
    parent = np.full(nn, -1, dtype=np.int64)
    slot = np.zeros(nn, dtype=np.int64)
    nrows = tree.ch_ref.size
    row_parent = np.repeat(
        np.arange(nn, dtype=np.int64), tree.node_ch_count
    )
    ends = np.cumsum(tree.node_ch_count)
    row_slot = (
        np.arange(nrows, dtype=np.int64)
        - np.repeat(ends - tree.node_ch_count, tree.node_ch_count)
    )
    nd_rows = ~tree.ch_is_pixel
    parent[tree.ch_ref[nd_rows]] = row_parent[nd_rows]
    slot[tree.ch_ref[nd_rows]] = row_slot[nd_rows]

    depth = np.zeros(nn, dtype=np.int16)
    # BFS ranges: parents always resolve in an earlier range
    for lo_, hi_ in tree.node_depth_ranges:
        par = parent[lo_:hi_]
        depth[lo_:hi_] = np.where(par < 0, 0, depth[np.maximum(par, 0)] + 1)
    hi, lo, digits, maxd = _pack_paths(depth, parent, slot, tree)

    # per-row (child slot) path keys: parent's digits + slot at parent depth
    rp = row_parent
    rdepth = depth[rp] + 1
    assert int(rdepth.max(initial=0)) <= 24
    rdig = digits[rp].copy()
    rdig[np.arange(nrows), rdepth - 1] = (row_slot + 1).astype(np.int8)
    rhi = np.zeros(nrows, dtype=np.int64)
    rlo = np.zeros(nrows, dtype=np.int64)
    for i in range(maxd):
        col = rdig[:, i].astype(np.int64)
        if i < 12:
            rhi = (rhi << 5) | col
        else:
            rlo = (rlo << 5) | col
    rhi <<= 5 * max(0, 12 - maxd)
    if maxd > 12:
        rlo <<= 5 * max(0, 24 - maxd)
    else:
        rlo[:] = 0

    st = SortedTree()
    st.parent = parent
    st.slot = slot
    st.depth = depth
    st.path_hi = hi
    st.path_lo = lo
    st.row_parent = row_parent
    st.row_slot = row_slot
    st.row_is_px = tree.ch_is_pixel
    st.row_ref = tree.ch_ref
    st.row_path_hi = rhi
    st.row_path_lo = rlo
    st.root_rank = {int(r): i for i, r in enumerate(tree.root_ids)}
    _SORTED[key] = st
    return st


def lis_segments_sorted(
    tree: Tree,
    node_s: np.ndarray,
    s_lin: np.ndarray,
    signs: np.ndarray,
    num_bp: int,
) -> List[np.ndarray]:
    """Per-pass LIS bit segments via sorting — byte-identical to the
    recursive set walk."""
    st = sorted_tree(tree)
    nn = node_s.size
    lev = tree.node_level.astype(np.int64)
    parent, is_root = st.parent, st.parent < 0

    b = np.where(is_root, 0, node_s[np.maximum(parent, 0)]).astype(np.int64)
    s = node_s.astype(np.int64)

    # anchors: first strict ancestor with smaller birth (or chain root)
    anchor = np.where(is_root, np.arange(nn), parent)
    for _ in range(int(st.depth.max()) + 1):
        a_par = parent[anchor]
        move = (~is_root) & (a_par >= 0) & (b[anchor] == b)
        anchor = np.where(move, np.maximum(a_par, 0), anchor)

    # O: per (level, birth) groups ascending, key (anchor level finer-first
    # with roots before everything, O[anchor], path).  Anchors of a b-group
    # have smaller b or are roots -> already resolved.
    root_rank = np.zeros(nn, dtype=np.int64)
    for r, i in st.root_rank.items():
        root_rank[r] = i
    O = np.full(nn, -1, dtype=np.int64)
    born = b < _NEVER
    ROOT_FIRST = -(10**6)  # roots precede any born node in their b=0 group
    # birth passes ascending GLOBALLY (anchors have a strictly smaller birth
    # or are roots, so every anchor's O resolves before it is compared,
    # regardless of its level); per-level offsets accumulate across passes.
    nlev = int(lev.max()) + 1
    offsets = np.zeros(nlev, dtype=np.int64)
    for bp in np.unique(b[born]):
        sel = np.flatnonzero(born & (b == bp))
        for t in np.unique(lev[sel]):
            grp = sel[lev[sel] == t]
            ar = anchor[grp]
            a_lev = np.where(is_root[grp], ROOT_FIRST, -lev[ar])
            # among anchors of the same level, roots precede born nodes (a
            # root sits in its list from pass 0; born anchors joined later),
            # and root_rank / O are separate scales — never compare across.
            a_born = np.where(is_root[grp] | is_root[ar], 0, 1)
            a_ord = np.where(
                is_root[grp], root_rank[grp],
                np.where(is_root[ar], root_rank[ar], O[ar]),
            )
            order = np.lexsort(
                (st.path_lo[grp], st.path_hi[grp], a_ord, a_born, a_lev)
            )
            O[grp[order]] = offsets[t] + np.arange(grp.size)
            offsets[t] += grp.size
    # walk order: levels desc, O asc
    w = np.full(nn, np.iinfo(np.int64).max, dtype=np.int64)
    bn = np.flatnonzero(born)
    worder = np.lexsort((O[bn], -lev[bn]))
    w[bn[worder]] = np.arange(bn.size)

    # ---- per-pass assembly -------------------------------------------------
    # list entries: cohort arrays sorted by w
    ent = bn[worder]  # nodes in walk order
    ent_from = np.where(is_root[ent], 0, b[ent] + 1)
    ent_s = s[ent]

    # block rows sorted by parent's partition pass for O(total) slicing
    rp = st.row_parent
    rowpass = s[rp]
    ractive = rowpass < _NEVER
    ridx = np.flatnonzero(ractive)
    rorder = ridx[np.argsort(rowpass[ridx], kind="stable")]
    rbounds = np.searchsorted(rowpass[rorder], np.arange(num_bp + 1))

    # per-row child significance value at the parent's partition pass
    ref = st.row_ref
    ispx = st.row_is_px
    px_lin = tree.px_linear
    row_sig_pass = np.where(
        ispx, s_lin[px_lin[np.where(ispx, ref, 0)]],
        s[np.where(ispx, 0, ref)],
    ).astype(np.int64)
    row_sign = np.zeros(ref.size, dtype=np.uint8)
    row_sign[ispx] = signs[px_lin[ref[ispx]]]

    # per-row top-anchor (valid at the parent's partition pass p):
    # q = row parent; top = q if b[q] < p (or root) else anchor[q]
    qp = rp
    top = np.where((b[qp] < s[qp]) | is_root[qp], qp, anchor[qp])
    w_top = w[top]

    # sibling skip rule per row: emitted unless (no earlier sig) and last slot
    sig_now = row_sig_pass == rowpass
    # prefix-any of sig among earlier siblings, per parent (rows are
    # parent-major contiguous in table order)
    cnt = tree.node_ch_count
    starts = tree.node_ch_start
    # sibling prefix-any of significance: exclusive cumsum within each parent
    csum = np.cumsum(sig_now.astype(np.int64))
    base = np.repeat(csum[starts] - sig_now[starts], cnt)
    prev_any = (csum - sig_now) - base
    last_slot = st.row_slot == np.repeat(cnt, cnt) - 1
    emitted = (prev_any > 0) | (~last_slot)

    segments: List[np.ndarray] = []
    for p in range(num_bp):
        # list-entry decision bits in walk order
        memb = (ent_from <= p) & (p <= ent_s)
        mi = np.flatnonzero(memb)
        e_bits = (ent_s[mi] == p).astype(np.uint8)
        e_w = w[ent[mi]]
        e_hi = st.path_hi[ent[mi]]
        e_lo = st.path_lo[ent[mi]]
        e_slot = np.zeros(mi.size, dtype=np.int8)

        # block bits for this pass
        rows = rorder[rbounds[p] : rbounds[p + 1]]
        em = emitted[rows]
        dec_rows = rows[em]
        d_bits = (row_sig_pass[dec_rows] == p).astype(np.uint8)
        d_w = w_top[dec_rows]
        d_hi = st.row_path_hi[dec_rows]
        d_lo = st.row_path_lo[dec_rows]
        d_slot = np.zeros(dec_rows.size, dtype=np.int8)
        # pixel sign bits (emitted for every significant pixel slot,
        # regardless of whether the decision itself was skipped)
        sg_rows = rows[(row_sig_pass[rows] == p) & ispx[rows]]
        g_bits = row_sign[sg_rows]
        g_w = w_top[sg_rows]
        g_hi = st.row_path_hi[sg_rows]
        g_lo = st.row_path_lo[sg_rows]
        g_slot = np.ones(sg_rows.size, dtype=np.int8)

        bits = np.concatenate([e_bits, d_bits, g_bits])
        kw = np.concatenate([e_w, d_w, g_w])
        khi = np.concatenate([e_hi, d_hi, g_hi])
        klo = np.concatenate([e_lo, d_lo, g_lo])
        ks = np.concatenate([e_slot, d_slot, g_slot])
        order = np.lexsort((ks, klo, khi, kw))
        segments.append(bits[order])
    return segments


__all__ = ["lis_segments_sorted", "sorted_tree"]
