"""Device-parallel Tour-Bus bubble pass (original formulation).

Reference behavior being reproduced (NOT its algorithm): bubblePinch
(src/bubble.c:2048-2135) serially Dijkstras from every edge with a
Fibonacci heap, backtracks when a node is reached twice
(comparePaths, :1766, bounded by MAXNODELENGTH), aligns the two path
sequences (compareSequences, :425-497, >=90% identity, length
difference <= DIFF) and merges the minority path onto the majority
(cleanUpRedundancy, :1617).  -M levels: M<=1 -> MAXNODELENGTH 3 /
DIFF 2, M==2 -> 9/3, M>=3 -> 30/10 (:2072-2086).

TPU-native reformulation — wave-parallel over flat arrays, no heap,
no serial tour:

1. majority forest: every live edge t picks prev[t] = its
   heaviest-coverage predecessor (one sort over the arc table).  The
   forest plays the role of Dijkstra's `previous[]`: the locally
   dominant way to arrive anywhere.
2. every NON-forest arc (u -> t) is a bubble candidate: walking
   <= MAXNODELENGTH steps up the forest from both t and u and
   intersecting the two chains yields the fork s and the two
   node-bounded paths s->..->t (majority) and s->..->u->t (minority)
   — all candidates in parallel, vmapped.
3. path sequences are gathered into fixed buffers and scored with a
   vectorized LCS (the banded-NW identity check's array-friendly
   equivalent): accept iff LCS >= 90% of max length and
   |lenA - lenB| <= DIFF.
4. accepted candidates CLAIM their edges (scatter-min arbitration);
   claim-disjoint winners apply in one wave: minority edges (and
   twins) deleted, their coverage added positionally onto the
   covering majority edges, their arcs remapped positionally onto the
   majority path.  Conflicting candidates retry in the next wave;
   waves iterate to fixpoint like the reference's HasChanged loop
   (:2123).

The merge SET can differ from the reference's serial order on graphs
where merge order matters; the engineered fixtures in
tests/test_bubbles.py pin the cases that must (and must not) merge.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dictionary
from . import arcs as arcs_mod
from . import unitigs

SEQ_CAP = 384    # longest differing-path sequence considered per side
CAND_CAP = 1024  # candidates arbitrated per wave (rest -> next wave)


def _params_for(merge_level: int) -> Tuple[int, int]:
    """(MAXNODELENGTH, DIFF) per -M (bubble.c:2072-2086)."""
    if merge_level <= 1:
        return 3, 2
    if merge_level == 2:
        return 9, 3
    return 30, 10


def available() -> bool:
    """Kept for API compatibility: the pass is pure JAX now."""
    return True


def _gather_or(x, idx, fill):
    safe = jnp.clip(idx, 0, x.shape[0] - 1)
    return jnp.where((idx >= 0) & (idx < x.shape[0]), x[safe], fill)


def _lcs_scores(a, b, la, lb, cap: int):
    """LCS length between a[:la] and b[:lb] per batch row — the
    identity measure for compareSequences' F-matrix check
    (bubble.c:425-497): matches / max(len) >= 0.9 accepts."""
    p = a.shape[0]
    ar = jnp.where(jnp.arange(cap)[None, :] < la[:, None], a, 254)
    br = jnp.where(jnp.arange(cap)[None, :] < lb[:, None], b, 255)

    def row_step(prev, i):
        ai = ar[:, i][:, None]
        match = (ai == br).astype(jnp.int32)
        cand = prev[:, :-1] + match
        upper = jnp.maximum(cand, prev[:, 1:])
        run = jax.lax.associative_scan(jnp.maximum, upper, axis=1)
        new = jnp.concatenate([jnp.zeros((p, 1), jnp.int32), run], axis=1)
        return new, None

    init = jnp.zeros((p, cap + 1), jnp.int32)
    final, _ = jax.lax.scan(row_step, init, jnp.arange(cap))
    return final[:, -1]


def _path_nodes(chain, s_idx, m_max: int, skip_last: int):
    """Interior nodes of a backward chain, re-ordered fork->join.

    chain[c, 0] is the join-side node, chain[c, s_idx[c]] the fork.
    Returns (C, m_max) node ids in PATH order (first-after-fork
    first), -1 padded.  skip_last=1 drops chain[0] (the majority
    chain starts at t, which is not part of the differing segment).
    """
    c = chain.shape[0]
    r = jnp.arange(m_max, dtype=jnp.int32)[None, :]
    idx = s_idx[:, None] - 1 - r
    valid = idx >= skip_last
    node = jnp.take_along_axis(
        chain, jnp.clip(idx, 0, chain.shape[1] - 1), axis=1)
    return jnp.where(valid, node, -1)


def _path_seq(nodes, eg, seq_cap: int):
    """Concatenate the appended-base sequences of a node list into a
    fixed (C, seq_cap) buffer; returns (seq, total_len)."""
    lens = _gather_or(eg.length, nodes, 0)          # (C, m)
    cum = jnp.cumsum(lens, axis=1) - lens           # exclusive starts
    total = jnp.sum(lens, axis=1)
    p = jnp.arange(seq_cap, dtype=jnp.int32)[None, :, None]  # (1, S, 1)
    started = p >= cum[:, None, :]                  # (C, S, m)
    inside = started & (p < (cum + lens)[:, None, :])
    seg = jnp.argmax(inside, axis=2).astype(jnp.int32)      # (C, S)
    hit = jnp.any(inside, axis=2)
    node_p = jnp.take_along_axis(nodes, seg, axis=1)
    off = _gather_or(eg.seq_off, node_p.reshape(-1), 0).reshape(seg.shape)
    start = jnp.take_along_axis(cum, seg, axis=1)
    pool_idx = off + (jnp.arange(seq_cap)[None, :] - start)
    pool_idx = jnp.clip(pool_idx, 0, eg.seq_pool.shape[0] - 1)
    base = eg.seq_pool[pool_idx]
    return jnp.where(hit, base, 250), total


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _wave(eg: unitigs.EdgeGraph, aset: arcs_mod.ArcSet, failed,
          m_max: int, diff: int, seq_cap: int, cand_cap: int):
    e_cap = eg.length.shape[0]
    a_cap = aset.from_ed.shape[0]
    BIG = jnp.int32(2**30)
    me = jnp.arange(e_cap, dtype=jnp.int32)
    live_e = (me < eg.n_edges) & ~eg.deleted
    f_live = _gather_or(live_e, aset.from_ed, False)
    t_live = _gather_or(live_e, aset.to_ed, False)
    varc = (aset.from_ed >= 0) & (aset.to_ed >= 0) & f_live & t_live & \
        (aset.mult > 0)

    # 1. majority forest: prev[t] = heaviest-coverage live predecessor
    cvg_f = _gather_or(eg.cvg, aset.from_ed, 0)
    to_k = jnp.where(varc, aset.to_ed, BIG)
    res = jax.lax.sort(
        (to_k, -jnp.where(varc, cvg_f, 0),
         jnp.where(varc, aset.from_ed, BIG)), num_keys=3)
    s_to, _, s_from = res
    head = jnp.concatenate([jnp.ones(1, bool), s_to[1:] != s_to[:-1]])
    head &= s_to < BIG
    prev = jnp.full(e_cap, -1, jnp.int32).at[
        jnp.where(head, s_to, e_cap)].set(s_from, mode="drop")

    # 2. candidates: non-forest arcs not yet examined-and-rejected
    # since the last graph change, weakest minority first
    tree = _gather_or(prev, aset.to_ed, -1) == aset.from_ed
    cand = varc & ~tree & ~failed
    n_cand = jnp.sum(cand.astype(jnp.int32))
    res = jax.lax.sort(
        ((~cand).astype(jnp.int32), jnp.where(cand, cvg_f, BIG),
         jnp.arange(a_cap, dtype=jnp.int32)), num_keys=2)
    cid_arc = res[2][:cand_cap]
    cmask = res[0][:cand_cap] == 0
    u = jnp.where(cmask, aset.from_ed[jnp.clip(cid_arc, 0, a_cap - 1)], -1)
    t0 = jnp.where(cmask, aset.to_ed[jnp.clip(cid_arc, 0, a_cap - 1)], -1)

    # 3. backward chains up the forest
    def walk(start, steps):
        def step(cur, _):
            return _gather_or(prev, cur, -1), cur
        _, hist = jax.lax.scan(step, start, None, length=steps)
        return hist.T  # (C, steps): [start, prev(start), ...]

    chain_a = walk(t0, m_max + 2)   # t, a1, ..  (fork at index >= 1)
    chain_b = walk(u, m_max + 1)    # u, b1, ..

    la_n, lb_n = chain_a.shape[1], chain_b.shape[1]
    eq = (chain_a[:, :, None] == chain_b[:, None, :]) \
        & (chain_a[:, :, None] >= 0) & (chain_b[:, None, :] >= 0)
    ii = jnp.arange(la_n, dtype=jnp.int32)[None, :, None]
    jj = jnp.arange(lb_n, dtype=jnp.int32)[None, None, :]
    cost = jnp.where(eq & (ii >= 1), ii + jj, BIG)
    flat = cost.reshape(cost.shape[0], -1)
    best = jnp.argmin(flat, axis=1).astype(jnp.int32)
    found = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0] < BIG
    i_s = best // lb_n
    j_s = best % lb_n
    found &= cmask & ((i_s - 1) <= m_max) & (j_s <= m_max)
    n_backtracked = jnp.sum(found.astype(jnp.int32))
    s_node = jnp.where(found, jnp.take_along_axis(
        chain_a, jnp.clip(i_s, 0, la_n - 1)[:, None], axis=1)[:, 0], -1)

    # 4. path interiors (fork->join order) + sequences + identity
    maj = _path_nodes(chain_a, i_s, m_max, skip_last=1)
    mnr = _path_nodes(chain_b, j_s, m_max, skip_last=0)
    maj = jnp.where(found[:, None], maj, -1)
    mnr = jnp.where(found[:, None], mnr, -1)
    # reject degenerate/self-touching candidates: the two paths (and
    # their twins) must be disjoint, and neither may touch s/t
    tw_maj = _gather_or(eg.twin, maj.reshape(-1), -1).reshape(maj.shape)
    tw_mnr = _gather_or(eg.twin, mnr.reshape(-1), -1).reshape(mnr.shape)
    ends = jnp.stack([s_node, t0,
                      _gather_or(eg.twin, s_node, -1),
                      _gather_or(eg.twin, t0, -1)], axis=1)
    maj_side = jnp.concatenate([maj, tw_maj, ends], axis=1)
    mnr_side = jnp.concatenate([mnr, tw_mnr], axis=1)
    clash = jnp.any(
        (mnr_side[:, :, None] == maj_side[:, None, :])
        & (mnr_side[:, :, None] >= 0), axis=(1, 2))
    # palindromes inside the minority path
    clash |= jnp.any((mnr == tw_mnr) & (mnr >= 0), axis=1)
    found &= ~clash & jnp.any(mnr >= 0, axis=1) & jnp.any(maj >= 0, axis=1)

    seq_a, len_a = _path_seq(maj, eg, seq_cap)
    seq_b, len_b = _path_seq(mnr, eg, seq_cap)
    len_ok = (jnp.abs(len_a - len_b) <= diff) & (len_a <= seq_cap) & \
        (len_b <= seq_cap)
    compared = found & len_ok
    n_compared = jnp.sum(compared.astype(jnp.int32))
    lcs = _lcs_scores(seq_a, seq_b,
                      jnp.where(compared, len_a, 0),
                      jnp.where(compared, len_b, 0), seq_cap)
    ok = compared & (lcs * 10 >= 9 * jnp.maximum(len_a, len_b))

    # 5. claim arbitration: winners are edge-disjoint within the wave
    c = maj.shape[0]
    cid = jnp.arange(c, dtype=jnp.int32)
    claims = jnp.concatenate([maj, tw_maj, mnr, tw_mnr, ends], axis=1)
    claims = jnp.where(ok[:, None] & (claims >= 0), claims, e_cap)
    rank = jnp.where(ok, jnp.sum(_gather_or(
        eg.cvg, mnr.reshape(-1), 0).reshape(mnr.shape)
        * (mnr >= 0), axis=1), BIG)
    q = claims.shape[1]
    flat_e = claims.reshape(-1)
    flat_rank = jnp.repeat(rank, q)
    flat_cid = jnp.repeat(cid, q)
    win_rank = jnp.full(e_cap + 1, BIG, jnp.int32).at[flat_e].min(flat_rank)
    tied = flat_rank == win_rank[flat_e]
    win_cid = jnp.full(e_cap + 1, BIG, jnp.int32).at[flat_e].min(
        jnp.where(tied, flat_cid, BIG))
    mine = (win_cid[flat_e] == flat_cid) | (flat_e == e_cap)
    win = ok & jnp.all(mine.reshape(c, q), axis=1)
    n_merged = jnp.sum(win.astype(jnp.int32))

    # 6. apply: delete minority (+twins), fold coverage positionally,
    # remap minority arcs onto the covering majority node
    mnr_w = jnp.where(win[:, None], mnr, -1)
    tw_mnr_w = jnp.where(win[:, None], tw_mnr, -1)
    del_idx = jnp.concatenate([mnr_w, tw_mnr_w], axis=1).reshape(-1)
    deleted2 = eg.deleted.at[jnp.where(del_idx >= 0, del_idx, e_cap)].set(
        True, mode="drop")

    # positional covering: minority node midpoint, scaled to the
    # majority path, picks the covering majority node
    lens_b = _gather_or(eg.length, mnr.reshape(-1), 0).reshape(mnr.shape)
    cum_b = jnp.cumsum(lens_b, axis=1) - lens_b
    mid_b = cum_b + lens_b // 2
    scale = jnp.where(len_b[:, None] > 0, mid_b * len_a[:, None] //
                      jnp.maximum(len_b, 1)[:, None], 0)
    lens_a = _gather_or(eg.length, maj.reshape(-1), 0).reshape(maj.shape)
    cum_a = jnp.cumsum(lens_a, axis=1) - lens_a
    inside = (scale[:, :, None] >= cum_a[:, None, :]) & \
        (scale[:, :, None] < (cum_a + lens_a)[:, None, :]) & \
        (maj[:, None, :] >= 0)
    cover = jnp.where(
        jnp.any(inside, axis=2),
        jnp.take_along_axis(
            maj, jnp.argmax(inside, axis=2).astype(jnp.int32), axis=1),
        # fallback: last live majority node
        jnp.take_along_axis(
            maj, jnp.maximum(jnp.sum((maj >= 0).astype(jnp.int32), axis=1)
                             - 1, 0)[:, None], axis=1)[:, 0][:, None]
        * jnp.ones_like(mnr))
    cover = jnp.where(mnr_w >= 0, cover, -1)
    tw_cover = _gather_or(eg.twin, cover.reshape(-1), -1).reshape(cover.shape)

    add_idx = jnp.concatenate([cover, tw_cover], axis=1).reshape(-1)
    add_val = jnp.concatenate(
        [_gather_or(eg.cvg, mnr_w.reshape(-1), 0).reshape(mnr_w.shape),
         _gather_or(eg.cvg, tw_mnr_w.reshape(-1), 0).reshape(tw_mnr_w.shape)],
        axis=1).reshape(-1)
    cvg2 = jnp.clip(
        eg.cvg.at[jnp.where(add_idx >= 0, add_idx, e_cap)].add(
            jnp.where(add_idx >= 0, add_val, 0), mode="drop"),
        0, unitigs.MAX_EDGE_COV)

    remap = me.at[jnp.where(mnr_w.reshape(-1) >= 0,
                            mnr_w.reshape(-1), e_cap)].set(
        jnp.where(cover.reshape(-1) >= 0, cover.reshape(-1), 0),
        mode="drop")
    remap = remap.at[jnp.where(tw_mnr_w.reshape(-1) >= 0,
                               tw_mnr_w.reshape(-1), e_cap)].set(
        jnp.where(tw_cover.reshape(-1) >= 0, tw_cover.reshape(-1), 0),
        mode="drop")

    new_f = jnp.where(aset.from_ed >= 0,
                      _gather_or(remap, aset.from_ed, -1), -1)
    new_t = jnp.where(aset.to_ed >= 0,
                      _gather_or(remap, aset.to_ed, -1), -1)
    # drop self-loops created by two minority nodes covering one
    # majority node (genuine pre-existing loops are preserved)
    created_loop = (new_f == new_t) & (aset.from_ed != aset.to_ed)
    new_f = jnp.where(created_loop, -1, new_f)
    new_t = jnp.where(created_loop, -1, new_t)
    new_mult = jnp.where(new_f >= 0, aset.mult, 0)

    overflow = jnp.maximum(n_cand - cand_cap, 0)
    # examined candidates rejected by the checks themselves (not by
    # claim arbitration — those must retry) are reported so the driver
    # can skip them until the graph next changes.  When n_merged == 0
    # no candidate was `ok` at all (the globally minimal (rank, cid)
    # ok-candidate always wins every edge it claims), so marking all
    # examined candidates failed is exact.
    fail_mark = cmask & ~ok
    return (cvg2, deleted2, new_f, new_t, new_mult,
            n_backtracked, n_compared, n_merged, overflow,
            cid_arc, fail_mark)


def pinch(eg: unitigs.EdgeGraph, aset: arcs_mod.ArcSet,
          k: int, merge_level: int):
    """Wave-parallel Tour-Bus to true fixpoint (bubble.c:2123-2126's
    HasChanged loop).  Returns (eg, aset, stats).

    The loop is bounded only by graph change: every productive wave
    deletes at least one edge, and between graph changes each
    unproductive wave permanently rejects a fresh CAND_CAP-chunk of
    the remaining candidates (the `failed` mask), so arbitrarily many
    simultaneous bubbles drain without growing any static buffer."""
    m_max, diff = _params_for(merge_level)
    stats = {"backtracked": 0, "compared": 0, "merged": 0, "waves": 0}
    failed = jnp.zeros(aset.from_ed.shape[0], bool)
    while True:
        stats["waves"] += 1
        (cvg2, deleted2, nf, nt, nm, n_back, n_cmp, n_merged,
         overflow, cid_arc, fail_mark) = _wave(
            eg, aset, failed, m_max, diff, SEQ_CAP, CAND_CAP)
        n = int(n_merged)
        stats["backtracked"] += int(n_back)
        stats["compared"] += int(n_cmp)
        if n == 0:
            if int(overflow) == 0:
                break
            # chunk exhausted without a merge: retire it, examine the
            # next cand_cap-chunk of candidates in the next wave
            a_cap = failed.shape[0]
            failed = failed.at[
                jnp.where(fail_mark, cid_arc, a_cap)].set(
                True, mode="drop")
            continue
        stats["merged"] += n
        eg = eg._replace(cvg=cvg2, deleted=deleted2)
        remapped = arcs_mod.ArcSet(nf, nt, nm, aset.n)
        empty = arcs_mod.ArcSet(
            jnp.full(1, -1, jnp.int32), jnp.full(1, -1, jnp.int32),
            jnp.zeros(1, jnp.int32), jnp.int32(0))
        aset = arcs_mod.merge_arcs(remapped, empty, eg.twin)
        # the merge changed the graph: every rejected candidate may be
        # mergeable now — clear the mask (sized to the rebuilt ArcSet)
        failed = jnp.zeros(aset.from_ed.shape[0], bool)
    return eg, aset, stats
