"""K-mer-level graph cleaning (pregraph stage).

TPU-native equivalents of cutTipPreGraph.c:

* minor_out  — removeMinorOut/clipKmerFromNode (:1012/:591): at nodes
  with >1 in- or out-neighbor, delete neighbor k-mers whose count is
  below dd% (default 5%) of the strongest sibling neighbor's count.
* single_tips — removeSingleTips (:339): clip dead-end chains of
  count-1 k-mers shorter than 2K nodes.
* minor_tips — removeMinorTips (:372): clip dead-end chains (any
  count) shorter than 2K nodes, unless the chain supplies the
  strongest link into its join node; iterated to fixpoint.

The reference walks tips serially from every endpoint
(clipTipFromNode, :43-336) and leaves interior chain nodes floating
after dislinking; here each pass finds ALL tips at once with the
shared list-ranking primitive and deletes the whole chain (floating
nodes never become edges in either design, so the edge graph agrees).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import dictionary, ranking
from . import dbg as dbg_mod

DEFAULT_MINOR_PCT = 5   # reference -i dd, global.h:110
TIP_FACTOR = 2          # cut_len = 2 * K (cutTipPreGraph.c:347)


def _gather_or(x, idx, fill):
    safe = jnp.clip(idx, 0, x.shape[0] - 1)
    return jnp.where((idx >= 0) & (idx < x.shape[0]), x[safe], fill)


@jax.jit
def _minor_out_device(table: dictionary.KmerTable, graph, pct):
    cap = table.capacity
    count = table.count
    # neighbor counts per existing out-arc, both strands.  FLAT (8cap,)
    # arrays throughout: a gather emitting an (N, 4) result gets a
    # T(8,128)-tiled layout whose minor dim pads 4 -> 128 (observed
    # 32x / 16 GB HLO temp at a 16.7M-row table); 1-D stays unpadded.
    succ_f = graph.succ            # arc-flat
    exists_f = graph.exists        # arc-flat
    succ_row = jnp.clip(succ_f, 0) >> 1
    ncount = jnp.where(exists_f, count[succ_row], 0)       # (8cap,)
    max_n = jnp.maximum(jnp.maximum(ncount[0::4], ncount[1::4]),
                        jnp.maximum(ncount[2::4], ncount[3::4]))
    branchy = graph.out_deg > 1
    # per-arc expansion via 1-D >>2 gathers (jnp.repeat(x, 4) stages
    # an (N, 4) broadcast the TPU compile helper rejects at this size)
    a4 = jnp.arange(exists_f.shape[0], dtype=jnp.int32) >> 2
    # delete neighbor when count/max < pct/100  <=>  100*count < pct*max
    weak = exists_f & branchy[a4] & (ncount > 0) & \
        (100 * ncount < pct * max_n[a4])
    # scatter deletions onto neighbor rows
    del_rows = jnp.where(weak, succ_row, cap)
    hits = jnp.zeros(cap + 1, jnp.int32).at[del_rows].add(
        1, mode="drop")[:cap]
    new_deleted = table.deleted | (hits > 0)
    n_del = jnp.sum((hits > 0) & ~table.deleted)
    return new_deleted, n_del


def minor_out(table: dictionary.KmerTable, k: int,
              pct: int = DEFAULT_MINOR_PCT) -> dictionary.KmerTable:
    graph = dbg_mod.build_dbg(table, k)
    deleted, n = _minor_out_device(table, graph, jnp.int32(pct))
    print(f"[kmer_clean] minor-out: {int(n)} kmers removed")
    return table._replace(deleted=deleted)


@functools.partial(jax.jit, static_argnums=(2,))
def _tip_prev(table: dictionary.KmerTable, graph, thin: bool):
    """Tip pass step 1: eligibility + backward chain pointers."""
    cap = table.capacity
    two_cap = 2 * cap
    nodes = jnp.arange(two_cap, dtype=jnp.int32)
    in_deg = graph.out_deg[nodes ^ 1]   # in_deg(u) = out_deg(twin)
    single = table.count[nodes >> 1] == 1

    elig = graph.linear & graph.live
    if thin:
        elig &= single
    head_cand = graph.live & (in_deg == 0) & (graph.out_deg == 1)
    if thin:
        head_cand &= single

    # unique out-arc base of the TWIN node, via per-base flat columns
    ex = graph.exists
    e0, e1, e2 = ex[0::4], ex[1::4], ex[2::4]
    xr = nodes ^ 1
    tb = jnp.where(e0[xr], 0, jnp.where(e1[xr], 1, jnp.where(
        e2[xr], 2, 3))).astype(jnp.int32)
    in_arc = dbg_mod.twin_arc(graph, dbg_mod.arc_id(xr, tb))
    pred = jnp.where(in_deg == 1, in_arc >> 2, -1)

    member = elig | head_cand
    prev = jnp.where(
        elig & (pred >= 0) & _gather_or(member, pred, False) &
        (_gather_or(graph.out_deg, pred, 0) == 1),
        pred, -1)
    prev = jnp.where(member, prev, -1)
    return prev, member, head_cand, in_deg


# host-level dispatcher: switches to per-round programs above
# ranking.STEPWISE_N nodes (the fused form faults the TPU worker
# there) — must NOT be wrapped in jax.jit
_rank_tips = ranking.list_rank


@jax.jit
def _tip_chains(head, rank, member, head_cand):
    """Tip pass step 3: chain membership + per-chain length."""
    two_cap = head.shape[0]
    chain_of_head_ok = _gather_or(head_cand, head, False)
    on_tip = member & chain_of_head_ok
    chain_len = jax.ops.segment_max(
        jnp.where(on_tip, rank + 1, 0),
        jnp.where(on_tip, head, two_cap),
        num_segments=two_cap + 1)[:two_cap]
    return on_tip, chain_len


@functools.partial(jax.jit, static_argnums=(7, 8))
def _tip_clip(table, graph, head, rank, on_tip, chain_len, in_deg,
              k: int, thin: bool):
    """Tip pass step 4: join inspection + chain deletion scatters."""
    cap = table.capacity
    two_cap = 2 * cap
    nodes = jnp.arange(two_cap, dtype=jnp.int32)
    ex = graph.exists
    e0, e1, e2 = ex[0::4], ex[1::4], ex[2::4]
    len_at_head = _gather_or(chain_len, head, 0)

    is_last = on_tip & (rank == len_at_head - 1)
    lb = jnp.where(e0, 0, jnp.where(e1, 1, jnp.where(
        e2, 2, 3))).astype(jnp.int32)   # unique out base
    join = jnp.where(is_last, graph.succ[4 * nodes + lb], -1)
    join_cov = jnp.where(is_last, graph.out_cov[4 * nodes + lb], 0)
    # join's max in-cov = max out_cov of twin(join) — flat gathers
    join_tw = dbg_mod.twin(jnp.clip(join, 0))
    oc = graph.out_cov
    jt4 = 4 * join_tw
    join_max_in = jnp.maximum(
        jnp.maximum(oc[jt4], oc[jt4 + 1]),
        jnp.maximum(oc[jt4 + 2], oc[jt4 + 3]))
    join_in_deg = _gather_or(in_deg, join, 0)
    join_out_deg = _gather_or(graph.out_deg, join, 0)
    # reference: sum of join's branches == 1 -> the whole component
    # dangles; clip unconditionally (and the join dies too)
    join_dangling = is_last & (join >= 0) & \
        (join_in_deg + join_out_deg == 1)
    if thin:
        clip_here = is_last & (join >= 0)
    else:
        clip_here = is_last & (join >= 0) & \
            (join_dangling | (join_cov < join_max_in))
    # a tip with NO join at all (isolated chain) — clip it too
    clip_here = clip_here | (is_last & (join < 0))

    clip_at_head = jnp.zeros(two_cap + 1, bool).at[
        jnp.where(clip_here, head, two_cap)].set(True, mode="drop")[:two_cap]
    ok_head = clip_at_head & (chain_len <= TIP_FACTOR * k)
    doomed = on_tip & _gather_or(ok_head, head, False)
    # joins of dangling single-link components die with the chain
    join_doomed_at = jnp.where(
        join_dangling & _gather_or(ok_head, head, False), join, -1)

    hits = jnp.zeros(cap + 1, bool)
    hits = hits.at[jnp.where(doomed, nodes >> 1, cap)].set(
        True, mode="drop")
    hits = hits.at[jnp.where(join_doomed_at >= 0,
                             join_doomed_at >> 1, cap)].set(
        True, mode="drop")
    hits = hits[:cap]
    new_deleted = table.deleted | hits
    n_del = jnp.sum(hits & ~table.deleted)
    return new_deleted, n_del


def _tip_pass_device(table: dictionary.KmerTable, graph, k: int,
                     thin: bool):
    """One tip-clipping pass, HOST-orchestrated across four jits: the
    fused single-program form kernel-faults the TPU worker at 16.7M-row
    tables (each piece runs fine; the split costs 3 extra dispatches)."""
    prev, member, head_cand, in_deg = _tip_prev(table, graph, thin)
    head, rank, _is_head = _rank_tips(prev, member)
    on_tip, chain_len = _tip_chains(head, rank, member, head_cand)
    return _tip_clip(table, graph, head, rank, on_tip, chain_len,
                     in_deg, k, thin)


def single_tips(table: dictionary.KmerTable, k: int) -> dictionary.KmerTable:
    graph = dbg_mod.build_dbg(table, k)
    deleted, n = _tip_pass_device(table, graph, k, True)
    print(f"[kmer_clean] single-cov tips: {int(n)} kmers removed")
    return table._replace(deleted=deleted)


def minor_tips(table: dictionary.KmerTable, k: int,
               max_rounds: int = 32) -> dictionary.KmerTable:
    total = 0
    for _ in range(max_rounds):
        graph = dbg_mod.build_dbg(table, k)
        deleted, n = _tip_pass_device(table, graph, k, False)
        n = int(n)
        table = table._replace(deleted=deleted)
        total += n
        if n == 0:
            break
    print(f"[kmer_clean] minor tips: {total} kmers removed")
    return table


def clip_tip_kmers(table: dictionary.KmerTable, k: int,
                   minor_pct: int = DEFAULT_MINOR_PCT,
                   skip_single: bool = False) -> dictionary.KmerTable:
    """Full pregraph cleaning sequence (reference pregraph.c:69-89):
    minor-out, then single tips (unless -d already filtered), then
    minor tips to fixpoint."""
    table = minor_out(table, k, minor_pct)
    if not skip_single:
        table = single_tips(table, k)
    table = minor_tips(table, k)
    return table
