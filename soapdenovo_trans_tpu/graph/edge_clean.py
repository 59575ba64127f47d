"""Edge-level graph cleaning (contig stage).

TPU-native equivalents of cutTip_graph.c:

* delete_weak_edges — deleteWeakEdge (:993): drop edges with
  cvg < cutoff (cutoff capped at 30, i.e. real coverage 3).
* cut_tips — cutTipsInGraph/isUnreliableTip (:439/:208): drop tip
  chains (no in-arcs, walked while 1-in-1-out) shorter than 2K bp
  unless they carry the dominant link into their join.
* delete_unlike_arcs — deleteUnlikeArc (:674): arc multiplicity
  < max(cvg_from, cvg_to)/25 or < 3 -> dropped.
* delow_high_arc — delowHighArc (:491): clamp anomalously heavy arcs
  to max(in_flow, out_flow).
* delete_simple_loops — deleteSimpleLoop (:1079): kill self-arcs and
  reciprocal 2-edge loops.
* delete_light_arcs — deleteLightArc (:635) = deleteLightOutArc(da%)
  + deleteLightFlowArc(dA%).
* delete_short_components — deleteShortContig(48)/extern_contig
  (:947/:849): connected components (arcs + twin pairing) whose total
  length is below the cutoff are dropped entirely.

Arcs are a sorted COO table; the (from,to) pair doubles as a 2-word
dictionary key so twin-arc partners resolve with the same binary
search used for k-mers.  All passes mutate multiplicities/deleted
masks and `compact_arcs` drops dead rows, replacing removeArc/
removeDeadArcs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import dictionary, ranking
from . import arcs as arcs_mod

MAX_WEAK_CVG = 30      # deleteWeakEdge caps cutoff at 30 (cvg x10 units)
UNLIKE_DIV = 25        # deleteUnlikeArc: mult < cvg/25
UNLIKE_MIN = 3         # deleteUnlikeArc: mult < 3
SHORT_COMPONENT = 48   # cut_length default, reference global.h


def _gather_or(x, idx, fill):
    safe = jnp.clip(idx, 0, x.shape[0] - 1)
    return jnp.where((idx >= 0) & (idx < x.shape[0]), x[safe], fill)


def _arc_keys(aset: arcs_mod.ArcSet):
    """(A, 2) uint32 key view of the sorted (from,to) pairs."""
    f = jnp.where(aset.from_ed >= 0, aset.from_ed, 2**30).astype(jnp.uint32)
    t = jnp.where(aset.from_ed >= 0, aset.to_ed, 2**30).astype(jnp.uint32)
    return jnp.stack([f, t], axis=-1)


def twin_arc_index(aset: arcs_mod.ArcSet, twin):
    """Row index of each arc's bal (twin) arc, via 2-word bisection."""
    keys = _arc_keys(aset)
    tf = _gather_or(twin, aset.to_ed, -1)
    tt = _gather_or(twin, aset.from_ed, -1)
    q = jnp.stack([jnp.where(tf >= 0, tf, 2**29).astype(jnp.uint32),
                   jnp.where(tt >= 0, tt, 2**29).astype(jnp.uint32)], axis=-1)
    return dictionary.lookup(keys, q)


def _sym_drop(aset: arcs_mod.ArcSet, drop, twin) -> jnp.ndarray:
    """Extend a drop mask to bal arcs (reference always zeroes both)."""
    ti = twin_arc_index(aset, twin)
    dropped_twin = jnp.zeros(aset.from_ed.shape[0] + 1, bool).at[
        jnp.where(drop & (ti >= 0), ti, aset.from_ed.shape[0])
    ].set(True, mode="drop")[: aset.from_ed.shape[0]]
    return drop | dropped_twin


def out_weights(aset: arcs_mod.ArcSet, e_cap: int):
    """total out-arc multiplicity per edge (in-flow = out of twin)."""
    f = jnp.where(aset.from_ed >= 0, aset.from_ed, e_cap)
    return jax.ops.segment_sum(
        aset.mult, f, num_segments=e_cap + 1)[:e_cap]


def delete_weak_edges(eg, cutoff: int):
    cutoff = min(cutoff, MAX_WEAK_CVG)
    live = jnp.arange(eg.length.shape[0]) < eg.n_edges
    weak = live & (eg.cvg < cutoff)
    weak = weak | _gather_or(weak, eg.twin, False)
    n = int(jnp.sum(weak & ~eg.deleted))
    print(f"[edge_clean] weak edges (<{cutoff/10:.1f}x): {n} removed")
    return eg._replace(deleted=eg.deleted | weak)


def delete_unlike_arcs(aset: arcs_mod.ArcSet, eg) -> arcs_mod.ArcSet:
    cvg_f = _gather_or(eg.cvg, aset.from_ed, 0)
    cvg_t = _gather_or(eg.cvg, aset.to_ed, 0)
    mx = jnp.maximum(cvg_f, cvg_t)
    drop = (aset.mult > 0) & (
        (aset.mult * UNLIKE_DIV < mx) | (aset.mult < UNLIKE_MIN))
    drop = _sym_drop(aset, drop, eg.twin)
    return aset._replace(mult=jnp.where(drop, 0, aset.mult))


def delow_high_arc(aset: arcs_mod.ArcSet, eg, multi: int) -> arcs_mod.ArcSet:
    e_cap = eg.length.shape[0]
    out_w = out_weights(aset, e_cap)
    in_w = _gather_or(out_w, eg.twin, 0)  # in-flow of e = out-flow of twin
    f_in = _gather_or(in_w, aset.from_ed, 0)
    t_out = _gather_or(out_w, aset.to_ed, 0)
    heavy = (aset.mult > 0) & (f_in > 0) & \
        (aset.mult > f_in * multi) & (aset.mult > t_out * multi)
    clamped = jnp.maximum(f_in, t_out)
    return aset._replace(
        mult=jnp.where(heavy, clamped, aset.mult))


def delete_simple_loops(aset: arcs_mod.ArcSet, eg) -> arcs_mod.ArcSet:
    self_loop = (aset.from_ed >= 0) & (aset.from_ed == aset.to_ed)
    # reciprocal: does (to, from) exist with mult > 0?
    keys = _arc_keys(aset)
    q = jnp.stack([jnp.where(aset.to_ed >= 0, aset.to_ed, 2**29)
                   .astype(jnp.uint32),
                   jnp.where(aset.from_ed >= 0, aset.from_ed, 2**29)
                   .astype(jnp.uint32)], axis=-1)
    rev = dictionary.lookup(keys, q)
    recip = (rev >= 0) & (_gather_or(aset.mult, rev, 0) > 0) & \
        (aset.mult > 0) & (aset.from_ed != aset.to_ed)
    drop = _sym_drop(aset, self_loop | recip, eg.twin)
    return aset._replace(mult=jnp.where(drop, 0, aset.mult))


def delete_light_arcs(aset: arcs_mod.ArcSet, eg,
                      da: int = 5, dA: int = 2):
    """Returns (new_arcs, changed?).  da: % of node out-weight;
    dA: % of in-flow / coverage (deleteLightOutArc/-FlowArc)."""
    e_cap = eg.length.shape[0]
    out_w = out_weights(aset, e_cap)
    # out-rate filter
    tot = _gather_or(out_w, aset.from_ed, 0)
    drop1 = (aset.mult > 0) & (aset.mult * 100 <= tot * da)
    # flow filter: vs in-flow of from-edge, and vs coverage
    in_w = _gather_or(out_w, eg.twin, 0)
    f_in = _gather_or(in_w, aset.from_ed, 0)
    cov = _gather_or(eg.cvg, aset.from_ed, 0) // 10
    drop2 = (aset.mult > 0) & (
        (aset.mult * 100 <= f_in * dA) | (aset.mult * 100 <= cov * dA))
    drop = _sym_drop(aset, drop1 | drop2, eg.twin)
    n = int(jnp.sum(drop & (aset.mult > 0)))
    return aset._replace(mult=jnp.where(drop, 0, aset.mult)), n > 0


def _edge_chain_state(eg, aset: arcs_mod.ArcSet):
    e_cap = eg.length.shape[0]
    live_arc = (aset.from_ed >= 0) & (aset.mult > 0) & \
        ~_gather_or(eg.deleted, aset.from_ed, True) & \
        ~_gather_or(eg.deleted, aset.to_ed, True)
    f = jnp.where(live_arc, aset.from_ed, e_cap)
    out_deg = jax.ops.segment_sum(
        live_arc.astype(jnp.int32), f, num_segments=e_cap + 1)[:e_cap]
    only_to = jnp.full(e_cap + 1, -1, jnp.int32).at[f].set(
        jnp.where(live_arc, aset.to_ed, -1), mode="drop")[:e_cap]
    only_mult = jnp.full(e_cap + 1, 0, jnp.int32).at[f].set(
        jnp.where(live_arc, aset.mult, 0), mode="drop")[:e_cap]
    in_deg = _gather_or(out_deg, eg.twin, 0)
    max_in_mult = jax.ops.segment_max(
        jnp.where(live_arc, aset.mult, 0),
        jnp.where(live_arc, aset.to_ed, e_cap),
        num_segments=e_cap + 1)[:e_cap]
    return out_deg, in_deg, only_to, only_mult, max_in_mult


@functools.partial(jax.jit, static_argnums=(2,))
def _cut_tips_once(eg, aset: arcs_mod.ArcSet, cut_len: int):
    e_cap = eg.length.shape[0]
    live = (jnp.arange(e_cap) < eg.n_edges) & ~eg.deleted
    out_deg, in_deg, only_to, only_mult, max_in_mult = \
        _edge_chain_state(eg, aset)
    self_twin = eg.twin == jnp.arange(e_cap)

    # chain membership: edges walked while in<=1 & out<=1
    walkable = live & (in_deg <= 1) & (out_deg <= 1) & ~self_twin
    head_cand = walkable & (in_deg == 0)
    # prev pointer along unique-arc linkage within walkable set
    nxt = jnp.where(walkable & (out_deg == 1), only_to, -1)
    nxt = jnp.where(_gather_or(walkable, nxt, False), nxt, -1)
    prev = jnp.full(e_cap, -1, jnp.int32).at[
        jnp.where(nxt >= 0, nxt, e_cap)].set(
            jnp.arange(e_cap), mode="drop")
    prev = jnp.where(walkable & (in_deg == 1), prev, -1)
    head, rank, _ = ranking.list_rank(prev, walkable)

    on_tip = walkable & _gather_or(head_cand, head, False)
    tip_len = jax.ops.segment_sum(
        jnp.where(on_tip, eg.length, 0),
        jnp.where(on_tip, head, e_cap), num_segments=e_cap + 1)[:e_cap]
    n_members = jax.ops.segment_sum(
        on_tip.astype(jnp.int32),
        jnp.where(on_tip, head, e_cap), num_segments=e_cap + 1)[:e_cap]
    len_at = _gather_or(tip_len, head, 1 << 30)
    short = len_at < cut_len

    is_last = on_tip & (rank == _gather_or(n_members, head, 0) - 1)
    join = jnp.where(is_last & (out_deg == 1), only_to, -1)
    join_mult = jnp.where(is_last, only_mult, 0)
    # dominance at the join: the tip survives if its arc into the join
    # is the unique strongest in-arc (isUnreliableTip caseD/E)
    jmax = _gather_or(max_in_mult, join, 0)
    join_in = _gather_or(in_deg, join, 0)
    clip = is_last & short & (
        (join < 0)                      # dangles into nothing (caseB)
        | (join_in < 2)                 # joins a non-branch (caseC-ish)
        | (join_mult == 1)              # caseD
        | (jmax > join_mult)            # caseE
    )
    clip_at_head = jnp.zeros(e_cap + 1, bool).at[
        jnp.where(clip, head, e_cap)].set(True, mode="drop")[:e_cap]
    doomed = on_tip & _gather_or(clip_at_head, head, False)
    doomed = doomed | _gather_or(doomed, eg.twin, False)
    n_clip = jnp.sum(doomed & ~eg.deleted)
    return eg.deleted | doomed, n_clip


def cut_tips(eg, aset: arcs_mod.ArcSet, k: int,
             cut_len: int = 0, max_rounds: int = 64):
    """cutTipsInGraph(0, 0): fixpoint tip clipping, cut_len = 2K."""
    cut_len = cut_len or 2 * k
    total = 0
    for _ in range(max_rounds):
        deleted, n = _cut_tips_once(eg, aset, cut_len)
        n = int(n)
        eg = eg._replace(deleted=deleted)
        total += n
        if n == 0:
            break
    print(f"[edge_clean] tips: {total} edges removed")
    return eg


def delete_short_components(eg, aset: arcs_mod.ArcSet,
                            cutoff: int = SHORT_COMPONENT,
                            max_rounds: int = 64):
    """deleteShortContig: drop whole weakly-connected components whose
    total edge length (counting each twin pair once) is < cutoff."""
    e_cap = eg.length.shape[0]
    live = (jnp.arange(e_cap) < eg.n_edges) & ~eg.deleted
    label = jnp.where(live, jnp.arange(e_cap), e_cap)
    live_arc = (aset.from_ed >= 0) & (aset.mult > 0) & \
        ~_gather_or(eg.deleted, aset.from_ed, True) & \
        ~_gather_or(eg.deleted, aset.to_ed, True)
    f = jnp.where(live_arc, aset.from_ed, 0)
    t = jnp.where(live_arc, aset.to_ed, 0)

    @jax.jit
    def propagate(label):
        # min-label over arc neighbors (both directions) and twin
        lt = jnp.where(live_arc, label[t], e_cap)
        lf = jnp.where(live_arc, label[f], e_cap)
        new = label
        new = new.at[jnp.where(live_arc, f, e_cap)].min(lt, mode="drop")
        new = new.at[jnp.where(live_arc, t, e_cap)].min(lf, mode="drop")
        tw_lab = jnp.where(live, _gather_or(new, eg.twin, e_cap), e_cap)
        new = jnp.minimum(new, tw_lab)
        return jnp.where(live, new, e_cap)

    for _ in range(max_rounds):
        new = propagate(label)
        if bool(jnp.all(new == label)):
            break
        label = new

    # component length, counting each twin pair once (rep = min(e, twin))
    rep = jnp.minimum(jnp.arange(e_cap), eg.twin)
    counted = live & (jnp.arange(e_cap) <= eg.twin)
    comp_len = jax.ops.segment_sum(
        jnp.where(counted, eg.length, 0),
        jnp.where(live, label, e_cap), num_segments=e_cap + 1)[:e_cap]
    doomed = live & (_gather_or(comp_len, label, 1 << 30) < cutoff)
    n = int(jnp.sum(doomed))
    print(f"[edge_clean] short components (<{cutoff}bp): {n} edges removed")
    return eg._replace(deleted=eg.deleted | doomed)


def compact_arcs(aset: arcs_mod.ArcSet, eg) -> arcs_mod.ArcSet:
    """removeArc/removeDeadArcs: drop zero-mult arcs and arcs touching
    deleted edges (COO stays sorted; rows masked to -1 and resorted)."""
    dead = (aset.mult <= 0) | (aset.from_ed < 0) | \
        _gather_or(eg.deleted, aset.from_ed, True) | \
        _gather_or(eg.deleted, aset.to_ed, True)
    live = ~dead
    f = jnp.where(live, aset.from_ed, -1)
    t = jnp.where(live, aset.to_ed, -1)
    m = jnp.where(live, aset.mult, 0)
    empty = arcs_mod.ArcSet(
        jnp.full(1, -1, jnp.int32), jnp.full(1, -1, jnp.int32),
        jnp.zeros(1, jnp.int32), jnp.int32(0))
    return arcs_mod.merge_arcs(
        arcs_mod.ArcSet(f, t, m, jnp.int32(0)), empty, eg.twin)
