"""Unitig condensation: k-mer graph -> edge (unitig) graph.

Replaces the reference's serial stack-walk condensation
(kmer2edges/startEdgeFromNode/stringBeads/merge_linearV2,
src/node2edge.c:46-589) with parallel list ranking:

1. every existing k-mer arc (u, b) gets a backward pointer to its
   unique predecessor arc when its tail node is linear (1-in-1-out);
2. pointer-doubling computes each arc's chain head and rank in
   O(log n) gather rounds (cycles of all-linear nodes are broken at
   their minimum arc id first — the reference can't even reach those);
3. per-edge fields (length, endpoints, coverage, sequence, twin) fall
   out of segment reductions keyed by chain head.

Every existing arc contributes exactly one base to exactly one edge,
so the concatenated 2-bit sequence pool is sized by the arc count.
Edge coverage follows the reference convention
(src/node2edge.c:500-536): 10x mean interior-node left-coverage for
length>1, 10x from-node count for length-1 edges, capped at
MaxEdgeCov=16000 (src/inc/def.h:37).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import bits, dictionary, ranking
from . import dbg as dbg_mod

MAX_EDGE_COV = 16000  # reference: src/inc/def.h:37


class EdgeGraph(NamedTuple):
    """Condensed edge (unitig) graph, struct-of-arrays.

    Rows [0, n_edges) are real; the rest is padding.  Each edge's twin
    (reverse complement) is a separate row; ``twin[e]`` indexes it
    (palindromic edges have twin[e] == e) — the explicit-array
    replacement for the reference's "twin is edge i±1" convention
    (src/loadPreGraph.c:543-548).
    """

    from_node: jnp.ndarray  # (Ecap,) int32 directed kmer-node id
    to_node: jnp.ndarray    # (Ecap,) int32
    length: jnp.ndarray     # (Ecap,) int32 — appended bases; full seq = K + length
    cvg: jnp.ndarray        # (Ecap,) int32 — 10x mean kmer coverage
    twin: jnp.ndarray       # (Ecap,) int32
    seq_off: jnp.ndarray    # (Ecap,) int32 offset into seq_pool
    seq_pool: jnp.ndarray   # (Scap,) uint8 appended bases, edge-major
    n_edges: jnp.ndarray    # () int32
    node_edge: jnp.ndarray  # (2cap,) int32 edge owning this interior node, or -1
    node_pos: jnp.ndarray   # (2cap,) int32 1-based position within edge
    deleted: jnp.ndarray    # (Ecap,) bool — removed by a cleaning pass


def _gather_or(x, idx, fill):
    """x[idx] with idx == -1 -> fill."""
    safe = jnp.clip(idx, 0, x.shape[0] - 1)
    return jnp.where(idx >= 0, x[safe], fill)


@jax.jit
def _arc_prev_device(graph: dbg_mod.DBG):
    """Flatten the (2cap, 4) arc grid and compute backward pointers."""
    two_cap = graph.out_deg.shape[0]
    exists = graph.exists          # arc-flat
    u = jnp.arange(two_cap * 4, dtype=jnp.int32) >> 2

    # unique in-arc of each linear node: twin of the unique out-arc of
    # its twin (valid only when out_deg[twin] == 1, i.e. in_deg == 1)
    nodes = jnp.arange(two_cap, dtype=jnp.int32)
    tw_n = dbg_mod.twin(nodes)
    # unique out-arc base of the TWIN node via flat per-base columns
    e0, e1, e2, e3 = exists[0::4], exists[1::4], exists[2::4], \
        exists[3::4]
    xr = nodes ^ 1
    tb = jnp.where(e0[xr], 0, jnp.where(e1[xr], 1, jnp.where(
        e2[xr], 2, 3))).astype(jnp.int32)
    node_in_arc = dbg_mod.twin_arc(graph, dbg_mod.arc_id(tw_n, tb))
    arc_prev = jnp.where(exists & graph.linear[u], node_in_arc[u], -1)
    # Defensive: a predecessor pointer must reference an existing arc.
    arc_prev = jnp.where(
        _gather_or(exists, arc_prev, False), arc_prev, -1
    )
    return arc_prev


def _arc_arrays(graph: dbg_mod.DBG):
    """Arc chain ranking, host-orchestrated: the ranking runs at
    4*two_cap elements (2^27 at a pow2-quantized 13M-kmer table), far
    beyond ranking.STEPWISE_N — it must go through the host-level
    list_rank dispatcher, not inline in a fused program (the fused
    form kernel-faults the TPU worker at 2^25+, see ops/ranking.py)."""
    arc_prev = _arc_prev_device(graph)
    head, rank, is_head = ranking.list_rank(arc_prev, graph.exists)
    n_edges = jnp.sum(is_head.astype(jnp.int32))
    n_arcs = jnp.sum(graph.exists.astype(jnp.int32))
    return head, rank, is_head, n_edges, n_arcs


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _extract_edges(graph: dbg_mod.DBG, table: dictionary.KmerTable,
                   k: int, e_cap: int, s_cap: int,
                   head, rank, is_head, n_edges):
    exists = graph.exists
    succ = graph.succ
    a_total = exists.shape[0]
    two_cap = graph.out_deg.shape[0]
    arc_ids = jnp.arange(a_total, dtype=jnp.int32)
    tail = arc_ids >> 2
    base = (arc_ids & 3).astype(jnp.uint8)

    # edge id at each head arc; every arc inherits via its chain head
    eid_at_arc = jnp.cumsum(is_head.astype(jnp.int32)) - 1
    edge_of = jnp.where(exists, eid_at_arc[head], e_cap)  # pad bucket

    length = jax.ops.segment_max(
        jnp.where(exists, rank + 1, 0), edge_of, num_segments=e_cap + 1
    )[:e_cap]
    length = jnp.maximum(length, 0)

    from_node = jnp.full(e_cap, -1, jnp.int32).at[
        jnp.where(is_head, edge_of, e_cap)].set(tail, mode="drop")
    is_last = exists & (rank == _gather_or(length, jnp.where(
        exists, edge_of, -1), 0) - 1)
    to_node = jnp.full(e_cap, -1, jnp.int32).at[
        jnp.where(is_last, edge_of, e_cap)].set(succ, mode="drop")
    last_arc = jnp.full(e_cap, -1, jnp.int32).at[
        jnp.where(is_last, edge_of, e_cap)].set(arc_ids, mode="drop")

    # twin edge: chain of twin arcs, headed by twin(last arc)
    twin_head_arc = dbg_mod.twin_arc(
        graph, jnp.clip(last_arc, 0, a_total - 1))
    twin_eid = jnp.where(
        (last_arc >= 0) & (twin_head_arc >= 0),
        eid_at_arc[head[jnp.clip(twin_head_arc, 0, a_total - 1)]], -1)

    # sequence pool: arc with rank r in edge e writes base at off[e] + r
    seq_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(length)[:-1]])
    pool_idx = jnp.where(
        exists, _gather_or(seq_off, jnp.where(exists, edge_of, -1), 0) + rank,
        s_cap)
    seq_pool = jnp.zeros(s_cap, jnp.uint8).at[pool_idx].set(base, mode="drop")

    # coverage (reference: src/node2edge.c:500-536)
    l_cov_sum = jnp.sum(table.l_cov, axis=1)  # per canonical row
    interior = exists & (rank + 1 < _gather_or(
        length, jnp.where(exists, edge_of, -1), 0))
    interior_node_row = jnp.clip(succ, 0) >> 1
    symbol = jax.ops.segment_sum(
        jnp.where(interior, l_cov_sum[interior_node_row], 0),
        edge_of, num_segments=e_cap + 1)[:e_cap]
    from_count = _gather_or(table.count, jnp.clip(from_node, -1) >> 1, 0)
    cvg_long = jnp.where(length > 1, symbol // jnp.maximum(length - 1, 1) * 10,
                         from_count * 10)
    cvg = jnp.clip(cvg_long, 0, MAX_EDGE_COV)

    # interior-node -> (edge, pos) map for read threading
    # (reference: l_links/r_links reuse, src/node2edge.c:493-519)
    node_idx = jnp.where(interior, succ, two_cap)
    node_edge = jnp.full(two_cap, -1, jnp.int32).at[node_idx].set(
        jnp.where(exists, edge_of, -1), mode="drop")
    node_pos = jnp.full(two_cap, -1, jnp.int32).at[node_idx].set(
        rank + 1, mode="drop")

    live_e = jnp.arange(e_cap) < n_edges
    return EdgeGraph(
        jnp.where(live_e, from_node, -1),
        jnp.where(live_e, to_node, -1),
        jnp.where(live_e, length, 0),
        jnp.where(live_e, cvg, 0),
        jnp.where(live_e, twin_eid, -1),
        seq_off, seq_pool, n_edges, node_edge, node_pos,
        jnp.zeros(e_cap, bool))


def condense(graph: dbg_mod.DBG, table: dictionary.KmerTable,
             k: int) -> EdgeGraph:
    """Host-orchestrated two-phase condensation (sizes read once)."""
    head, rank, is_head, n_edges, n_arcs = _arc_arrays(graph)
    e_cap = dictionary.round_up(max(int(n_edges), 1))
    s_cap = dictionary.round_up(max(int(n_arcs), 1))
    return _extract_edges(graph, table, k, e_cap, s_cap,
                          head, rank, is_head, n_edges)


def edge_sequences(eg: EdgeGraph, table: dictionary.KmerTable, k: int):
    """Decode full edge sequences (K-mer prefix + appended bases) to a
    host list of strings (for FASTA output and tests)."""
    import numpy as np

    keys = np.asarray(table.keys)
    pool = np.asarray(eg.seq_pool)
    n = int(eg.n_edges)
    out = []
    for e in range(n):
        fn = int(eg.from_node[e])
        row, s = fn >> 1, fn & 1
        km = bits.kmer_to_string(keys[row], k)
        if s:
            km = bits.revcomp_str(km)
        ln = int(eg.length[e])
        off = int(eg.seq_off[e])
        tail_str = "".join(bits.BASE_CHARS[b] for b in pool[off : off + ln])
        out.append(km + tail_str)
    return out
