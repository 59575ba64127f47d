"""Edge-graph linear concatenation -> contigs.

Replaces linearConcatenate (reference src/concatenateEdge.c:227-296)
and compactEdgeArray (src/compactEdge.c:94).  The reference iterates
"merge one pair per lap" to a fixpoint; here the whole transitive
chain collapses in one list-ranking pass:

An edge e chains into its unique successor t when
  e has exactly one out-arc (to t), t has exactly one in-arc,
  t != twin(t), e != twin(e), t not in {e, twin(e)}
— exactly the conditions of concatenateEdge.c:253-277.  Merged
attributes follow allpathUpdateEdge: length = sum, coverage =
length-weighted mean (>=1), sequence = concatenation; surviving arcs
are remapped onto chain ids and re-aggregated.  Compaction (dropping
deleted edges and renumbering) happens in the same pass.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import dictionary, ranking
from . import arcs as arcs_mod
from . import unitigs


class Contigs(NamedTuple):
    """Contig array after concatenation (also used as the 'updated
    edge' graph consumed by the scaffold stage)."""

    from_node: jnp.ndarray  # (Ccap,) int32 directed kmer-node of first vertex
    to_node: jnp.ndarray    # (Ccap,) int32
    length: jnp.ndarray     # (Ccap,) int32 appended bases (full = K + length)
    cvg: jnp.ndarray        # (Ccap,) int32 10x mean kmer coverage
    twin: jnp.ndarray       # (Ccap,) int32
    seq_off: jnp.ndarray    # (Ccap,) int32
    seq_pool: jnp.ndarray   # (Scap,) uint8
    n: jnp.ndarray          # () int32
    edge2contig: jnp.ndarray  # (Ecap,) int32 member edge -> contig id
    arcs: arcs_mod.ArcSet   # remapped surviving arcs


def _gather_or(x, idx, fill):
    safe = jnp.clip(idx, 0, x.shape[0] - 1)
    return jnp.where((idx >= 0) & (idx < x.shape[0]), x[safe], fill)


def _edge_degrees(aset: arcs_mod.ArcSet, e_cap: int, deleted, twin):
    """Per-edge out-degree and unique out-target from the COO arc set,
    ignoring arcs that touch deleted edges."""
    live_arc = (aset.from_ed >= 0) & \
        ~_gather_or(deleted, aset.from_ed, True) & \
        ~_gather_or(deleted, aset.to_ed, True)
    f = jnp.where(live_arc, aset.from_ed, e_cap)
    out_deg = jax.ops.segment_sum(
        live_arc.astype(jnp.int32), f, num_segments=e_cap + 1)[:e_cap]
    only_to = jnp.full(e_cap + 1, -1, jnp.int32).at[f].set(
        jnp.where(live_arc, aset.to_ed, -1), mode="drop")[:e_cap]
    return out_deg, only_to, live_arc


@jax.jit
def _chain_pointers(eg, aset: arcs_mod.ArcSet):
    e_cap = eg.length.shape[0]
    deleted = _edge_deleted(eg)
    out_deg, only_to, live_arc = _edge_degrees(aset, e_cap, deleted, eg.twin)
    in_deg = _gather_or(out_deg, eg.twin, 0)  # in_deg(e) = out_deg(twin(e))
    self_twin = eg.twin == jnp.arange(e_cap)

    t = only_to
    ok = (out_deg == 1) & ~deleted & ~self_twin & (t >= 0)
    ok &= ~_gather_or(deleted, t, True)
    ok &= _gather_or(in_deg, t, 0) == 1
    ok &= ~_gather_or(self_twin, t, True)
    ok &= (t != jnp.arange(e_cap)) & (t != eg.twin)
    nxt = jnp.where(ok, t, -1)

    # backward pointer: prev[t] = e iff nxt[e] == t (unique by in_deg)
    prev = jnp.full(e_cap, -1, jnp.int32).at[
        jnp.where(ok, t, e_cap)].set(jnp.arange(e_cap), mode="drop")
    exists = ~deleted & (jnp.arange(e_cap) < eg.n_edges)
    prev = jnp.where(exists, prev, -1)
    head, rank, is_head = ranking.list_rank(prev, exists)
    n_chains = jnp.sum(is_head.astype(jnp.int32))
    return head, rank, is_head, n_chains, live_arc, nxt, exists


def _edge_deleted(eg):
    return eg.deleted


@functools.partial(jax.jit, static_argnums=(2, 3))
def _merge(eg, aset: arcs_mod.ArcSet, c_cap: int, s_cap: int):
    e_cap = eg.length.shape[0]
    head, rank, is_head, n_chains, live_arc, nxt, exists = \
        _chain_pointers(eg, aset)

    cid_at_head = jnp.cumsum(is_head.astype(jnp.int32)) - 1
    chain_of = jnp.where(exists, cid_at_head[head], c_cap)

    length = jax.ops.segment_sum(
        jnp.where(exists, eg.length, 0), chain_of,
        num_segments=c_cap + 1)[:c_cap]
    cvg_w = jax.ops.segment_sum(
        jnp.where(exists, eg.cvg * eg.length, 0), chain_of,
        num_segments=c_cap + 1)[:c_cap]
    cvg = jnp.maximum(cvg_w // jnp.maximum(length, 1), 1)

    n_members = jax.ops.segment_sum(
        exists.astype(jnp.int32), chain_of, num_segments=c_cap + 1)[:c_cap]
    from_node = jnp.full(c_cap, -1, jnp.int32).at[
        jnp.where(is_head, chain_of, c_cap)].set(eg.from_node, mode="drop")
    is_last = exists & (rank == _gather_or(
        n_members, jnp.where(exists, chain_of, -1), 0) - 1)
    to_node = jnp.full(c_cap, -1, jnp.int32).at[
        jnp.where(is_last, chain_of, c_cap)].set(eg.to_node, mode="drop")
    last_edge = jnp.full(c_cap, -1, jnp.int32).at[
        jnp.where(is_last, chain_of, c_cap)].set(
            jnp.arange(e_cap), mode="drop")

    # twin chain: headed by twin(last edge of this chain)
    twin_head_edge = _gather_or(eg.twin, last_edge, -1)
    twin_cid = jnp.where(
        twin_head_edge >= 0,
        cid_at_head[head[jnp.clip(twin_head_edge, 0, e_cap - 1)]], -1)

    # ---- sequence pool rebuild ----
    # prefix length of each edge within its chain: order members by
    # (chain, rank) and take an exclusive running sum of lengths.
    order_key = jnp.where(exists, chain_of * (e_cap + 1) + rank, 2**30)
    sort_key, sort_edge = jax.lax.sort(
        (order_key, jnp.arange(e_cap, dtype=jnp.int32)), num_keys=1)
    sorted_len = jnp.where(sort_key < 2**30, eg.length[sort_edge], 0)
    run = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(sorted_len)[:-1]])
    sorted_chain = jnp.where(sort_key < 2**30, chain_of[sort_edge], -1)
    chain_first = jnp.concatenate(
        [jnp.ones(1, bool), sorted_chain[1:] != sorted_chain[:-1]])
    chain_base = jnp.where(chain_first, run, 0)
    chain_base = jax.lax.associative_scan(jnp.maximum, chain_base)
    prefix_sorted = run - chain_base
    prefix = jnp.zeros(e_cap, jnp.int32).at[sort_edge].set(prefix_sorted)

    contig_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(length)[:-1]])

    # per-base remap: base i of the old pool belongs to edge edge_of_base
    s_old = eg.seq_pool.shape[0]
    base_idx = jnp.arange(s_old, dtype=jnp.int32)
    marks = jnp.zeros(s_old + 1, jnp.int32).at[
        jnp.where(exists & (eg.length > 0), eg.seq_off, s_old)].add(
            1, mode="drop")[:s_old]
    edge_of_base = jnp.cumsum(marks) - 1  # index into sorted-by-offset edges
    # seq_off is ascending over live edges by construction (both in
    # unitigs and here), so edge_of_base indexes edges ordered by
    # offset; build that order:
    off_key = jnp.where(exists & (eg.length > 0), eg.seq_off, 2**30)
    _, edges_by_off = jax.lax.sort(
        (off_key, jnp.arange(e_cap, dtype=jnp.int32)), num_keys=1)
    owner = _gather_or(edges_by_off, edge_of_base, -1)
    owner_valid = (owner >= 0) & _gather_or(exists, owner, False)
    owner_valid &= base_idx < (
        _gather_or(eg.seq_off, owner, 0) + _gather_or(eg.length, owner, 0))
    new_idx = jnp.where(
        owner_valid,
        _gather_or(contig_off, _gather_or(chain_of, owner, -1), 0)
        + _gather_or(prefix, owner, 0)
        + base_idx - _gather_or(eg.seq_off, owner, 0),
        s_cap)
    seq_pool = jnp.zeros(s_cap, jnp.uint8).at[new_idx].set(
        eg.seq_pool, mode="drop")

    # ---- arc remap ----
    consumed = live_arc & (
        _gather_or(nxt, aset.from_ed, -2) == aset.to_ed)
    keep = live_arc & ~consumed
    new_f = jnp.where(keep, _gather_or(chain_of, aset.from_ed, -1), -1)
    new_t = jnp.where(keep, _gather_or(chain_of, aset.to_ed, -1), -1)

    live_c = jnp.arange(c_cap) < n_chains
    return Contigs(
        jnp.where(live_c, from_node, -1),
        jnp.where(live_c, to_node, -1),
        jnp.where(live_c, length, 0),
        jnp.where(live_c, cvg, 0),
        jnp.where(live_c, twin_cid, -1),
        contig_off, seq_pool, n_chains,
        jnp.where(exists, chain_of, -1),
        arcs_mod.ArcSet(new_f, new_t,
                        jnp.where(keep, aset.mult, 0), jnp.int32(0)),
    )


def concatenate(eg, aset: arcs_mod.ArcSet) -> Contigs:
    """Host-orchestrated concatenation + compaction."""
    *_head, n_chains, _live, _nxt, exists = _chain_pointers(eg, aset)
    c_cap = dictionary.round_up(max(int(n_chains), 1))
    total_len = int(jnp.sum(jnp.where(exists, eg.length, 0)))
    s_cap = dictionary.round_up(max(total_len, 1))
    ctg = _merge(eg, aset, c_cap, s_cap)
    # re-aggregate remapped arcs (multiplicities of parallel old arcs add)
    a = ctg.arcs
    new_arcs = arcs_mod.merge_arcs(
        arcs_mod.ArcSet(a.from_ed, a.to_ed, a.mult, jnp.int32(0)),
        arcs_mod.ArcSet(jnp.full(1, -1, jnp.int32),
                        jnp.full(1, -1, jnp.int32),
                        jnp.zeros(1, jnp.int32), jnp.int32(0)),
        ctg.twin)
    return ctg._replace(arcs=new_arcs)


def contig_sequences(ctg: Contigs, table, k: int):
    """Decode full contig sequences to host strings (K-mer prefix +
    appended bases)."""
    import numpy as np

    from ..ops import bits

    keys = np.asarray(table.keys)
    pool = np.asarray(ctg.seq_pool)
    n = int(ctg.n)
    out = []
    for c in range(n):
        fn = int(ctg.from_node[c])
        row, s = fn >> 1, fn & 1
        km = bits.kmer_to_string(keys[row], k)
        if s:
            km = bits.revcomp_str(km)
        ln = int(ctg.length[c])
        off = int(ctg.seq_off[c])
        tail = "".join(bits.BASE_CHARS[b] for b in pool[off : off + ln])
        out.append(km + tail)
    return out


def contig_file_perm(ctg: Contigs, k: int):
    """The .contig/.ContigIndex id assignment (output_contig.c:135-170):
    contigs sorted by full length ascending (stable on row), each twin
    pair claiming consecutive ids with the representative first.
    Returns perm: new id - 1 -> contig row."""
    import numpy as np

    n = int(ctg.n)
    lengths = np.asarray(ctg.length[:n]) + k
    twin = np.asarray(ctg.twin[:n])
    order = np.argsort(lengths, kind="stable")
    printed = np.zeros(n, bool)
    perm = []
    for row in order:
        if printed[row]:
            continue
        printed[row] = True
        perm.append(int(row))
        t = int(twin[row])
        if 0 <= t < n and t != row:
            printed[t] = True
            perm.append(t)
    return perm


def reorder_contigs(ctg: Contigs, perm) -> Contigs:
    """Permute contig rows into the .contig/.ContigIndex file order so
    internal row i == file id i+1 everywhere downstream (the reference
    keeps an index_array to translate between the map-stage and
    scaff-stage numberings, loadGraph.c:309; we renumber once
    instead)."""
    import numpy as np
    import jax.numpy as jnp

    n = int(ctg.n)
    cap = ctg.length.shape[0]
    perm = np.asarray(perm, np.int64)
    old2new = np.full(cap, -1, np.int64)
    old2new[perm] = np.arange(n)

    def permute(a):
        a = np.asarray(a)
        out = a.copy()
        out[:n] = a[perm]
        return jnp.asarray(out)

    def remap_ids(a):
        a = np.asarray(a)
        safe = np.clip(a, 0, cap - 1)
        return jnp.asarray(np.where(a >= 0, old2new[safe], a).astype(a.dtype))

    twin = np.asarray(ctg.twin)
    new_twin = np.where(twin[: cap] >= 0,
                        old2new[np.clip(twin, 0, cap - 1)], -1)
    new_twin_p = new_twin.copy()
    new_twin_p[:n] = new_twin[perm]
    aset = ctg.arcs
    aset = aset._replace(from_ed=remap_ids(aset.from_ed),
                         to_ed=remap_ids(aset.to_ed))
    return Contigs(
        permute(ctg.from_node), permute(ctg.to_node),
        permute(ctg.length), permute(ctg.cvg),
        jnp.asarray(new_twin_p.astype(np.int32)),
        permute(ctg.seq_off), ctg.seq_pool, ctg.n,
        remap_ids(ctg.edge2contig), aset)
