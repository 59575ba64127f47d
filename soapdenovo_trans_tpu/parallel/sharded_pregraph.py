"""Mesh-resident pregraph passes: DBG build, k-mer cleaning, unitig
condensation and read->preArc threading over the SHARDED k-mer table.

These are the sharded twins of graph/dbg.py, graph/kmer_clean.py,
graph/unitigs.py and graph/arcs.thread_reads — same semantics, but the
table never leaves the mesh (parallel/sharded_count.py keeps it
resident; VERDICT r2 item 2 / reference scale target README.md:9).
Cross-shard access goes through the routed primitives in
parallel/sharded_graph.py.

Id spaces (shard s of D, per-shard row capacity ``cap``):

* global row      g = s*cap + i
* directed node   u = 2*g + orient       (twin(u) = u^1, same shard)
* node arrays     (D, 2*cap, ...) — node u lives at [u // (2cap),
                  u % (2cap)]
* arc             a = (u // 2cap)*8cap + (u % 2cap)*4 + b — arcs live
                  on their tail node's shard

The outputs that are small relative to the table (the condensed edge
graph, its sequence pool, the preArc candidates) are gathered to the
HOST — exactly SURVEY.md §7.3's plan ("condense on shards, gather
edges to a replicated array"); everything table-sized stays sharded.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import bits, dictionary
from . import sharded_graph

AXIS = sharded_graph.AXIS

# compiled local-step caches, keyed by (mesh id, static geometry)
_DBG_STEP_CACHE: dict = {}
_CHOP_STEP_CACHE: dict = {}
_THREAD_STEP_CACHE: dict = {}


class ShardedDBG(NamedTuple):
    """Directed-node de Bruijn view, sharded by node (twin-colocated).

    Same fields as graph/dbg.DBG, with ``succ`` holding GLOBAL
    directed ids (or -1 for missing/dead successors — the routed
    lookup filters dead rows, folding dbg.py's succ_live check in).
    """

    out_cov: jnp.ndarray    # (D, 2cap, 4) int32
    succ: jnp.ndarray       # (D, 2cap, 4) int32 global directed id or -1
    exists: jnp.ndarray     # (D, 2cap, 4) bool
    out_deg: jnp.ndarray    # (D, 2cap) int32
    in_deg: jnp.ndarray     # (D, 2cap) int32
    linear: jnp.ndarray     # (D, 2cap) bool
    first_base: jnp.ndarray  # (D, 2cap) int32
    live: jnp.ndarray       # (D, 2cap) bool


def _node_router(mesh, cap):
    return sharded_graph.Router(mesh, 2 * cap)


def _arc_router(mesh, cap):
    return sharded_graph.Router(mesh, 8 * cap)


def _row_router(mesh, cap):
    return sharded_graph.Router(mesh, cap)


class Routers(NamedTuple):
    row: sharded_graph.Router
    node: sharded_graph.Router
    arc: sharded_graph.Router
    cap: int

    @classmethod
    def build(cls, mesh: Mesh, cap: int) -> "Routers":
        return cls(_row_router(mesh, cap), _node_router(mesh, cap),
                   _arc_router(mesh, cap), cap)


# ---------------------------------------------------------------------------
# local (per-shard) steps, wrapped in shard_map by the public builders
# ---------------------------------------------------------------------------


def _make_local_candidates(mesh: Mesh, cap: int, k: int):
    """Per-shard: oriented kmers -> successor-candidate queries plus
    the purely local DBG fields."""
    w = bits.words_for_k(k)

    def step(keys, n, deleted, l_cov, r_cov):
        keys = keys.reshape(cap, w)
        deleted = deleted.reshape(cap)
        l_cov = l_cov.reshape(cap, 4)
        r_cov = r_cov.reshape(cap, 4)
        n_live = n.reshape(())

        rc = bits.reverse_complement(keys, k)
        oriented = jnp.stack([keys, rc], axis=1).reshape(2 * cap, w)
        live_row = (jnp.arange(cap) < n_live) & (deleted == 0)
        live = jnp.repeat(live_row, 2)

        rev_l = l_cov[:, jnp.asarray([2, 3, 0, 1])]
        out_cov = jnp.stack([r_cov, rev_l], axis=1).reshape(2 * cap, 4)

        base4 = jnp.arange(4, dtype=jnp.uint32)
        ext = bits.next_kmer(
            jnp.broadcast_to(oriented[:, None, :], (2 * cap, 4, w)),
            jnp.broadcast_to(base4, (2 * cap, 4)), k)
        can, use_rc = bits.canonical(ext.reshape(-1, w), k)
        # dead sources need no successors: sentinel queries never hit
        can = jnp.where(jnp.repeat(live, 4)[:, None], can,
                        jnp.uint32(0xFFFFFFFF))
        fb = bits.first_base(oriented, k).astype(jnp.int32)
        return (can[None], use_rc.astype(jnp.int32)[None],
                out_cov[None], fb[None], live[None])

    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS, None, None), P(AXIS), P(AXIS, None),
                  P(AXIS, None, None), P(AXIS, None, None)),
        out_specs=(P(AXIS, None, None), P(AXIS, None),
                   P(AXIS, None, None), P(AXIS, None), P(AXIS, None)))
    return jax.jit(mapped)


@functools.partial(jax.jit, static_argnums=(4,))
def _assemble_dbg(rows, use_rc, out_cov, fb, cap, live):
    d = rows.shape[0]
    succ = jnp.where(rows >= 0, 2 * rows + use_rc, -1)
    succ = succ.reshape(d, 2 * cap, 4)
    exists = (out_cov > 0) & (succ >= 0) & live[..., None]
    succ = jnp.where(exists, succ, -1)
    out_deg = jnp.sum(exists.astype(jnp.int32), axis=-1)
    in_deg = out_deg.reshape(d, cap, 2)[:, :, ::-1].reshape(d, 2 * cap)
    linear = (out_deg == 1) & (in_deg == 1) & live
    return ShardedDBG(out_cov, succ, exists, out_deg, in_deg, linear,
                      fb, live)


def build_dbg_sharded(mesh: Mesh, routers: Routers, st, deleted,
                      k: int) -> ShardedDBG:
    """Sharded twin of dbg.build_dbg: one routed lookup resolves all
    2*cap*4 successor candidates per shard."""
    cap = st.keys.shape[1]
    key = (id(mesh), cap, k)
    fn = _DBG_STEP_CACHE.get(key)
    if fn is None:
        fn = _make_local_candidates(mesh, cap, k)
        _DBG_STEP_CACHE[key] = fn
    can, use_rc, out_cov, fb, live = fn(
        st.keys, st.n, deleted, st.l_cov, st.r_cov)
    rows = routers.row.lookup(st.keys, st.n, deleted, can, k=k)
    return _assemble_dbg(rows, use_rc, out_cov, fb, cap, live)


# ---------------------------------------------------------------------------
# arc-id arithmetic over the sharded layout
# ---------------------------------------------------------------------------


def arc_of(u_global, b, cap):
    """Global arc id of (global directed node, base)."""
    s = u_global // (2 * cap)
    loc = u_global % (2 * cap)
    return s * (8 * cap) + loc * 4 + b


def arc_tail(a_global, cap):
    """Global directed node owning arc a (its tail)."""
    s = a_global // (8 * cap)
    return s * (2 * cap) + (a_global % (8 * cap)) // 4


def twin_arc_local(dbg: ShardedDBG, cap: int):
    """(D, 2cap, 4) global twin-arc ids — local arithmetic only:
    twin(succ(u,b)) --comp(first_base(u))--> (dbg.twin_arc)."""
    v = dbg.succ
    fb = dbg.first_base[..., None]
    return jnp.where(v >= 0, arc_of(v ^ 1, fb ^ 2, cap), -1)


# ---------------------------------------------------------------------------
# k-mer cleaning (sharded kmer_clean)
# ---------------------------------------------------------------------------


def minor_out_sharded(mesh, routers: Routers, st, deleted, k: int,
                      pct: int):
    """Sharded removeMinorOut (kmer_clean.minor_out)."""
    cap = routers.cap
    d = st.keys.shape[0]
    dbg = build_dbg_sharded(mesh, routers, st, deleted, k)
    succ_row = jnp.where(dbg.succ >= 0, dbg.succ >> 1, -1)
    ncount = routers.row.gather1(
        st.count, succ_row.reshape(d, -1)).reshape(d, 2 * cap, 4)
    ncount = jnp.where(dbg.exists, ncount, 0)
    max_n = jnp.max(ncount, axis=-1)
    weak = dbg.exists & (dbg.out_deg > 1)[..., None] & (ncount > 0) & \
        (100 * ncount < pct * max_n[..., None])
    del_rows = jnp.where(weak, succ_row, -1).reshape(d, -1)
    hits = routers.row.scatter1(
        del_rows, jnp.ones_like(del_rows), op="or")
    new_deleted = jnp.where(hits > 0, 1, deleted)
    n_del = int(jnp.sum((hits > 0) & (deleted == 0)))
    return new_deleted, n_del


def _tip_pass_sharded(mesh, routers: Routers, st, deleted, k: int,
                      thin: bool):
    """Sharded twin of kmer_clean._tip_pass_device."""
    cap = routers.cap
    d = st.keys.shape[0]
    two_cap = 2 * cap
    dbg = build_dbg_sharded(mesh, routers, st, deleted, k)
    self_u = jnp.arange(d * two_cap, dtype=jnp.int32).reshape(d, two_cap)
    row_count = jnp.repeat(st.count, 2, axis=1)  # count per node
    single = row_count == 1

    elig = dbg.linear & dbg.live
    head_cand = dbg.live & (dbg.in_deg == 0) & (dbg.out_deg == 1)
    if thin:
        elig &= single
        head_cand &= single

    # predecessor: twin of the twin-node's unique out-arc
    tw_loc = self_u ^ 1
    twin_exists = dbg.exists.reshape(d, cap, 2, 4)[:, :, ::-1].reshape(
        d, two_cap, 4)
    tb = jnp.argmax(twin_exists, axis=-1).astype(jnp.int32)
    twin_succ = dbg.succ.reshape(d, cap, 2, 4)[:, :, ::-1].reshape(
        d, two_cap, 4)
    twin_fb = dbg.first_base.reshape(d, cap, 2)[:, :, ::-1].reshape(
        d, two_cap)
    v = jnp.take_along_axis(twin_succ, tb[..., None], axis=-1)[..., 0]
    in_arc_tail = jnp.where(v >= 0, v ^ 1, -1)   # pred directed node
    pred = jnp.where(dbg.in_deg == 1, in_arc_tail, -1)

    member = elig | head_cand
    pm = routers.node.gather(
        jnp.stack([member.astype(jnp.int32), dbg.out_deg], axis=-1),
        pred, n_fields=2)
    prev = jnp.where(
        elig & (pred >= 0) & (pm[..., 0] > 0) & (pm[..., 1] == 1),
        pred, -1)
    prev = jnp.where(member, prev, -1)
    head, rank, is_head = sharded_graph.sharded_list_rank(
        routers.node, prev, member)

    chain_ok = routers.node.gather1(
        head_cand.astype(jnp.int32), jnp.where(member, head, -1)) > 0
    on_tip = member & chain_ok
    chain_len = routers.node.scatter1(
        jnp.where(on_tip, head, -1), jnp.where(on_tip, rank + 1, 0),
        op="max")
    chain_len = jnp.maximum(chain_len, 0)
    len_at_head = routers.node.gather1(
        chain_len, jnp.where(on_tip, head, -1))

    is_last = on_tip & (rank == len_at_head - 1)
    lb = jnp.argmax(dbg.exists, axis=-1).astype(jnp.int32)
    join = jnp.take_along_axis(dbg.succ, lb[..., None], axis=-1)[..., 0]
    join = jnp.where(is_last, join, -1)
    join_cov = jnp.take_along_axis(
        dbg.out_cov, lb[..., None], axis=-1)[..., 0]
    join_cov = jnp.where(is_last, join_cov, 0)
    max_out = jnp.max(dbg.out_cov, axis=-1)
    jg = routers.node.gather(
        jnp.stack([dbg.in_deg, dbg.out_deg], axis=-1), join, n_fields=2)
    join_in_deg = jnp.where(join >= 0, jg[..., 0], 0)
    join_out_deg = jnp.where(join >= 0, jg[..., 1], 0)
    join_max_in = routers.node.gather1(
        max_out, jnp.where(join >= 0, join ^ 1, -1))

    join_dangling = is_last & (join >= 0) & \
        (join_in_deg + join_out_deg == 1)
    if thin:
        clip_here = is_last & (join >= 0)
    else:
        clip_here = is_last & (join >= 0) & \
            (join_dangling | (join_cov < join_max_in))
    clip_here = clip_here | (is_last & (join < 0))

    clip_at_head = routers.node.scatter1(
        jnp.where(clip_here, head, -1),
        jnp.ones_like(head), op="or") > 0
    ok_head = clip_at_head & (chain_len <= 2 * k)
    doomed = on_tip & (routers.node.gather1(
        ok_head.astype(jnp.int32), jnp.where(on_tip, head, -1)) > 0)
    ok_at_me = routers.node.gather1(
        ok_head.astype(jnp.int32), jnp.where(is_last, head, -1)) > 0
    join_doomed_at = jnp.where(join_dangling & ok_at_me, join, -1)

    # node doom -> row deletion (local fold over the two orientations)
    row_doomed = doomed.reshape(d, cap, 2).any(axis=-1)
    join_rows = jnp.where(join_doomed_at >= 0, join_doomed_at >> 1, -1)
    join_hits = routers.row.scatter1(
        join_rows, jnp.ones_like(join_rows), op="or") > 0
    hits = row_doomed | join_hits
    new_deleted = jnp.where(hits, 1, deleted)
    n_del = int(jnp.sum(hits & (deleted == 0)))
    return new_deleted, n_del


def clip_tip_kmers_sharded(mesh, routers: Routers, st, deleted, k: int,
                           minor_pct: int = 5, skip_single: bool = False,
                           max_rounds: int = 32):
    """Sharded kmer_clean.clip_tip_kmers (pregraph.c:69-89 order)."""
    deleted, n = minor_out_sharded(mesh, routers, st, deleted, k,
                                   minor_pct)
    print(f"[kmer_clean] minor-out: {n} kmers removed")
    if not skip_single:
        deleted, n = _tip_pass_sharded(mesh, routers, st, deleted, k,
                                       True)
        print(f"[kmer_clean] single-cov tips: {n} kmers removed")
    total = 0
    for _ in range(max_rounds):
        deleted, n = _tip_pass_sharded(mesh, routers, st, deleted, k,
                                       False)
        total += n
        if n == 0:
            break
    print(f"[kmer_clean] minor tips: {total} kmers removed")
    return deleted


# ---------------------------------------------------------------------------
# condensation (sharded unitigs.condense) -> host EdgeGraph + mini table
# ---------------------------------------------------------------------------


def _exclusive_shard_prefix(counts):
    """(D,) per-shard totals -> (D,) exclusive prefix (host-side)."""
    c = np.asarray(counts)
    return np.concatenate([[0], np.cumsum(c)[:-1]]).astype(np.int32)


def condense_sharded(mesh, routers: Routers, st, deleted, k: int,
                     dbg: ShardedDBG | None = None):
    """Sharded unitigs.condense.  Returns (EdgeGraph on host with ids
    into a mini endpoint table, mini KmerTable, node_edge (D, 2cap)
    global-edge ids, node_pos (D, 2cap)) — the last two stay sharded
    for read threading.

    All table-sized reductions (per-edge length/endpoint/coverage and
    the sequence-pool scatter) run on the mesh through edge-sharded /
    pool-sharded Routers; the only host materializations are O(edges)
    (the final EdgeGraph gather, SURVEY.md §7.3's "gather edges to a
    replicated array")."""
    from ..graph import unitigs

    cap = routers.cap
    if dbg is None:
        dbg = build_dbg_sharded(mesh, routers, st, deleted, k)
    d = dbg.succ.shape[0]
    two_cap = 2 * cap
    m_arc = 8 * cap

    exists = dbg.exists.reshape(d, m_arc)
    succ = dbg.succ.reshape(d, m_arc)
    base = jnp.broadcast_to(
        jnp.arange(4, dtype=jnp.int32)[None, None, :],
        (d, two_cap, 4)).reshape(d, m_arc)
    shard_id = jnp.arange(d, dtype=jnp.int32)[:, None]
    tail_u = shard_id * two_cap + jnp.broadcast_to(
        (jnp.arange(m_arc, dtype=jnp.int32) // 4)[None], (d, m_arc))
    arc_ids = shard_id * m_arc + jnp.broadcast_to(
        jnp.arange(m_arc, dtype=jnp.int32)[None], (d, m_arc))

    # unique in-arc per node (local, same construction as the tip pass)
    twin_arcs = twin_arc_local(dbg, cap)      # (d, 2cap, 4) global
    twin_exists = dbg.exists.reshape(d, cap, 2, 4)[:, :, ::-1].reshape(
        d, two_cap, 4)
    tb = jnp.argmax(twin_exists, axis=-1).astype(jnp.int32)
    twin_arcs_of_twin = twin_arcs.reshape(d, cap, 2, 4)[:, :, ::-1] \
        .reshape(d, two_cap, 4)
    node_in_arc = jnp.take_along_axis(
        twin_arcs_of_twin, tb[..., None], axis=-1)[..., 0]
    lin_at_tail = jnp.repeat(
        dbg.linear, 4, axis=1).reshape(d, m_arc)
    in_arc_at_tail = jnp.repeat(node_in_arc, 4, axis=1).reshape(d, m_arc)
    arc_prev = jnp.where(exists & lin_at_tail, in_arc_at_tail, -1)
    prev_exists = routers.arc.gather1(
        exists.astype(jnp.int32), arc_prev) > 0
    arc_prev = jnp.where(prev_exists, arc_prev, -1)

    head, rank, is_head = sharded_graph.sharded_list_rank(
        routers.arc, arc_prev, exists)

    # global edge ids: local cumsum + exclusive shard prefix
    local_counts = jnp.sum(is_head.astype(jnp.int32), axis=1)
    prefix = jnp.asarray(_exclusive_shard_prefix(local_counts))
    eid_here = jnp.cumsum(is_head.astype(jnp.int32), axis=1) - 1 + \
        prefix[:, None]
    n_edges = int(np.asarray(local_counts).sum())
    e_cap = dictionary.round_up(max(n_edges, 1))
    edge_of = routers.arc.gather1(
        jnp.where(is_head, eid_here, -1), jnp.where(exists, head, -1))
    edge_of = jnp.where(exists, edge_of, -1)

    # edge-level reductions ride the mesh: edges get their own
    # contiguously-sharded id space (global edge e lives on shard
    # e // e_loc), and every per-edge statistic is one routed
    # segment-scatter instead of a (D, e_cap) host array
    e_loc = max(1, -(-e_cap // d))
    edge_router = sharded_graph.Router(mesh, e_loc)

    def edge_reduce(idx, val, op):
        acc = edge_router.scatter1(idx, val.astype(jnp.int32), op=op)
        return acc        # (D, e_loc) sharded; _NEG/0 where unwritten

    def to_host(acc, fill):
        flat = np.asarray(acc).reshape(-1)[:e_cap].astype(np.int64)
        return np.maximum(flat, fill)

    length_sh = jnp.maximum(
        edge_reduce(edge_of, rank + 1, "max"), 0)     # (D, e_loc)
    length = to_host(length_sh, 0).astype(np.int32)

    from_node = to_host(edge_reduce(
        jnp.where(is_head, edge_of, -1), tail_u, "max"), -1)
    len_at_arc = edge_router.gather1(length_sh, edge_of)
    is_last = exists & (rank == len_at_arc - 1)
    to_node = to_host(edge_reduce(
        jnp.where(is_last, edge_of, -1), succ, "max"), -1)
    last_arc = to_host(edge_reduce(
        jnp.where(is_last, edge_of, -1), arc_ids, "max"), -1)

    # twin edge: eid at head of the twin arc of the last arc
    la_pad = _pad_to_mesh(last_arc, d)
    la_tail = arc_tail(np.maximum(la_pad, 0), cap)
    la_succ = np.asarray(routers.arc.gather1(succ, jnp.asarray(
        np.where(la_pad >= 0, la_pad, -1).astype(np.int32))))
    fb_nodes = dbg.first_base.reshape(d, two_cap)
    la_fb = np.asarray(routers.node.gather1(
        fb_nodes, jnp.asarray(np.where(
            la_pad >= 0, la_tail, -1).astype(np.int32))))
    twin_head_arc = np.where(
        (la_pad >= 0) & (la_succ >= 0),
        arc_of(la_succ ^ 1, la_fb ^ 2, cap), -1)
    th_head = np.asarray(routers.arc.gather1(
        head, jnp.asarray(twin_head_arc.astype(np.int32))))
    twin_eid = np.asarray(routers.arc.gather1(
        jnp.where(is_head, eid_here, -1),
        jnp.asarray(np.where(twin_head_arc >= 0, th_head, -1)
                    .astype(np.int32))))
    twin_eid = _unpad(twin_eid, e_cap)

    # sequence pool: routed scatter into a pool-sharded array —
    # pool slot seq_off[edge] + rank, written exactly once per
    # interior position, so a max-scatter is a plain store
    seq_off = np.concatenate([[0], np.cumsum(length)[:-1]]).astype(np.int64)
    s_cap = dictionary.round_up(max(int(length.sum()), 1))
    p_loc = max(1, -(-s_cap // d))
    pool_router = sharded_graph.Router(mesh, p_loc)
    off_pad = np.full(d * e_loc, -1, np.int64)
    off_pad[:e_cap] = np.where(length > 0, seq_off, -1)
    seq_off_dev = jnp.asarray(off_pad.reshape(d, e_loc).astype(np.int32))
    off_at_arc = edge_router.gather1(seq_off_dev, edge_of)
    pool_idx = jnp.where(exists & (edge_of >= 0) & (off_at_arc >= 0),
                         off_at_arc + rank, -1)
    pool_sh = pool_router.scatter1(pool_idx, base, op="max")
    # cast to u8 on device: the pool read-back is the one
    # assembly-sized host transfer (O(edge bases)); 1 B/base, not 4
    pool_u8 = jnp.maximum(pool_sh, 0).astype(jnp.uint8)
    seq_pool = np.asarray(pool_u8).reshape(-1)[:s_cap].copy()

    # coverage: interior-node l_cov sums routed per arc
    l_sum = jnp.sum(st.l_cov, axis=-1)              # (d, cap)
    interior = exists & (rank + 1 < len_at_arc)
    succ_row = jnp.where(interior, succ >> 1, -1)
    int_cov = routers.row.gather1(l_sum, succ_row)
    symbol = to_host(edge_reduce(
        jnp.where(interior, edge_of, -1),
        jnp.where(interior, int_cov, 0), "add"), 0)
    fn_pad = _pad_to_mesh(from_node, d)
    from_count = np.asarray(routers.row.gather1(
        st.count, jnp.asarray(
            np.where(fn_pad >= 0, fn_pad >> 1, -1).astype(np.int32))))
    from_count = _unpad(from_count, e_cap)
    cvg_long = np.where(
        length > 1, symbol // np.maximum(length - 1, 1) * 10,
        np.maximum(from_count, 0) * 10)
    cvg = np.clip(cvg_long, 0, unitigs.MAX_EDGE_COV).astype(np.int32)

    # interior-node -> (edge, pos) map, sharded (for read threading)
    node_idx = jnp.where(jnp.asarray(interior), succ, -1)
    ne = routers.node.scatter(
        node_idx,
        jnp.stack([jnp.where(jnp.asarray(interior), edge_of, -1),
                   jnp.where(jnp.asarray(interior), rank + 1, -1)],
                  axis=-1), op="max", n_fields=2)
    node_edge = jnp.maximum(ne[..., 0], -1)
    node_pos = jnp.maximum(ne[..., 1], -1)

    # mini endpoint table + remap: every from/to directed node
    eg, table = _build_mini_edgegraph(
        routers, st, k, e_cap, n_edges, from_node, to_node, length,
        cvg, twin_eid, seq_off, seq_pool, d)
    return eg, table, node_edge, node_pos


def _pad_to_mesh(x, d):
    """(E,) host array -> (d, ceil(E/d)) for routed calls."""
    e = x.shape[0]
    per = (e + d - 1) // d
    out = np.full(d * per, -1, np.int64)
    out[:e] = x
    return out.reshape(d, per)


def _unpad(x, e):
    return np.asarray(x).reshape(-1)[:e]


def _build_mini_edgegraph(routers, st, k, e_cap, n_edges, from_node,
                          to_node, length, cvg, twin_eid, seq_off,
                          seq_pool, d):
    """Gather endpoint kmers into a dense mini KmerTable and remap the
    edge endpoints into it (same compatibility-table trick as
    io/graph_files.load_contig_graph_files)."""
    from ..graph import unitigs

    w = st.keys.shape[-1]
    ends = np.concatenate([from_node, to_node])
    rows = np.where(ends >= 0, ends >> 1, -1)
    uniq_rows = np.unique(rows[rows >= 0])
    if uniq_rows.size == 0:
        uniq_rows = np.zeros(1, np.int64)
    rq = _pad_to_mesh(uniq_rows, d)
    key_fields = np.asarray(routers.row.gather(
        jnp.asarray(st.keys.astype(jnp.int32)),
        jnp.asarray(rq.astype(np.int32)), n_fields=w))
    keys_u = _unpad_rows(key_fields, uniq_rows.size, w).astype(np.uint32)
    # dense mini table must be sorted by key; routed gather returned
    # rows in uniq_rows (global-id) order == key order (prefix shards)
    mini_cap = dictionary.round_up(max(uniq_rows.size, 1))
    mini_keys = np.full((mini_cap, w), 0xFFFFFFFF, np.uint32)
    mini_keys[: uniq_rows.size] = keys_u

    def remap(nodes):
        rows = np.where(nodes >= 0, nodes >> 1, 0)
        mini = np.searchsorted(uniq_rows, rows)
        return np.where(nodes >= 0, 2 * mini + (nodes & 1), -1)

    table = dictionary.KmerTable(
        jnp.asarray(mini_keys),
        jnp.zeros(mini_cap, jnp.int32),
        jnp.zeros((mini_cap, 4), jnp.int32),
        jnp.zeros((mini_cap, 4), jnp.int32),
        jnp.int32(uniq_rows.size),
        jnp.zeros(mini_cap, bool))

    live_e = np.arange(e_cap) < n_edges
    eg = unitigs.EdgeGraph(
        jnp.asarray(np.where(live_e, remap(from_node), -1)
                    .astype(np.int32)),
        jnp.asarray(np.where(live_e, remap(to_node), -1)
                    .astype(np.int32)),
        jnp.asarray(np.where(live_e, length, 0).astype(np.int32)),
        jnp.asarray(np.where(live_e, cvg, 0).astype(np.int32)),
        jnp.asarray(np.where(live_e, twin_eid, -1).astype(np.int32)),
        jnp.asarray(seq_off.astype(np.int32)),
        jnp.asarray(seq_pool),
        jnp.int32(n_edges),
        jnp.full(2 * mini_cap, -1, jnp.int32),   # node_edge: unused in
        jnp.full(2 * mini_cap, -1, jnp.int32),   # the sharded path
        jnp.zeros(e_cap, bool))
    return eg, table


def _unpad_rows(x, n, f):
    return np.asarray(x).reshape(-1, f)[:n]


def kmer_freq_sharded(mesh: Mesh, st, deleted, max_freq: int = 256):
    """.kmerFreq histogram over the resident shards (freqStat,
    prlHashReads.c:994): per-shard bincount partials, summed host-side
    — the table never gathers."""
    cap = st.keys.shape[1]

    def step(count, n, deleted):
        count = count.reshape(cap)
        live = (jnp.arange(cap) < n.reshape(())) & \
            (deleted.reshape(cap) == 0)
        clamped = jnp.clip(count, 0, max_freq - 1)
        hist = jnp.zeros(max_freq, jnp.int32).at[
            jnp.where(live, clamped, 0)].add(
            live.astype(jnp.int32), mode="drop")
        return hist[None]

    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(AXIS, None)),
        out_specs=P(AXIS, None))
    part = jax.jit(mapped)(st.count, st.n, deleted)
    return np.asarray(part).sum(axis=0)


# ---------------------------------------------------------------------------
# read -> preArc threading over the sharded table
# ---------------------------------------------------------------------------


def _make_chop_step(mesh: Mesh, k: int, r_local: int, read_len: int):
    """Per-shard read chopping at K and K+1 in (D, m, ...) layout."""
    from ..ops import kmer as kmer_mod

    def step(seqs, lengths):
        seqs = seqs.reshape(r_local, read_len)
        lengths = lengths.reshape(r_local)
        s = kmer_mod.chop_reads(seqs, lengths, k)
        s1 = kmer_mod.chop_reads(seqs, lengths, k + 1)
        kq = jnp.where(s.valid[:, None], s.kmers, jnp.uint32(0xFFFFFFFF))
        return (kq[None], s.is_rc.astype(jnp.int32)[None],
                s.valid[None], s1.kmers[None],
                s1.is_rc.astype(jnp.int32)[None], s1.valid[None])

    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS)),
        out_specs=(P(AXIS, None, None), P(AXIS, None), P(AXIS, None),
                   P(AXIS, None, None), P(AXIS, None), P(AXIS, None)))
    return jax.jit(mapped)


def _thread_local(eid_flat, valid, lengths, p_kmers, p_rc, p_valid,
                  patch_and_twin, r, p, k):
    """Per-read path-slot logic given resolved edge ids — the local
    part of arcs.thread_reads (see that docstring for semantics)."""
    patch_keys, patch_edge, eg_twin = patch_and_twin

    def g(x, idx, fill):
        safe = jnp.clip(idx, 0, x.shape[0] - 1)
        return jnp.where((idx >= 0) & (idx < x.shape[0]), x[safe], fill)

    node_live = eid_flat > -2          # -2 = dead/missing node
    eid = jnp.where(valid & node_live, eid_flat, -1)
    interior = (eid >= 0).reshape(r, p)
    vertexish = (valid & node_live & (eid < 0)).reshape(r, p)
    in_read = (jnp.arange(p)[None, :] + k) <= lengths[:, None]
    barrier = in_read & ~(valid & node_live).reshape(r, p)
    eid = eid.reshape(r, p)

    mq = p_kmers.shape[0]
    cap_p = patch_keys.shape[0]
    lo = jnp.zeros(mq, jnp.int32)
    hi = jnp.full(mq, cap_p, jnp.int32)
    for _ in range(int(cap_p).bit_length()):
        live_q = lo < hi
        mid = (lo + hi) >> 1
        row_k = patch_keys[jnp.clip(mid, 0, cap_p - 1)]
        less = bits.lex_less(row_k, p_kmers)
        lo = jnp.where(live_q & less, mid + 1, lo)
        hi = jnp.where(live_q & ~less, mid, hi)
    found = patch_keys[jnp.clip(lo, 0, cap_p - 1)]
    prow = jnp.where((lo < cap_p) & bits.lex_eq(found, p_kmers), lo, -1)
    pedge = g(patch_edge, prow, -1)
    pedge = jnp.where((pedge >= 0) & (p_rc > 0),
                      g(eg_twin, jnp.clip(pedge, 0), -1), pedge)
    pedge = jnp.where(p_valid, pedge, -1).reshape(r, p - 1)
    pair_ok = vertexish[:, :-1] & vertexish[:, 1:] & (pedge >= 0)
    pair_eid = jnp.where(pair_ok, pedge, -1)

    prev_same = jnp.concatenate(
        [jnp.zeros((r, 1), bool),
         interior[:, :-1] & (eid[:, :-1] == eid[:, 1:])], axis=1)
    is_entry_pos = interior & ~prev_same
    from ..graph import arcs as arcs_mod

    return arcs_mod._path_slots(
        jnp.where(is_entry_pos, eid, -1), pair_eid, barrier)


def thread_reads_sharded(mesh, routers: Routers, st, deleted,
                         node_edge, node_pos, eg, patch, seqs, lengths,
                         k: int):
    """Sharded arcs.thread_reads: routed lookup + node_edge gather
    resolve read k-mers to edge ids; path logic is local per read.

    seqs (R, L) / lengths (R,) live host-side; R must divide D.
    Returns (from_ed, to_ed, valid) host arrays for arcs.count_arcs.
    """
    d = st.keys.shape[0]
    r, l = seqs.shape
    assert r % d == 0
    r_loc = r // d
    p = l - k + 1

    ckey = (id(mesh), k, r_loc, l)
    chop = _CHOP_STEP_CACHE.get(ckey)
    if chop is None:
        chop = _make_chop_step(mesh, k, r_loc, l)
        _CHOP_STEP_CACHE[ckey] = chop
    from jax.sharding import NamedSharding

    sh2 = NamedSharding(mesh, P(AXIS, None))
    sh1 = NamedSharding(mesh, P(AXIS))
    seqs_d = jax.device_put(jnp.asarray(seqs), sh2)
    lens_d = jax.device_put(jnp.asarray(lengths), sh1)
    kq, is_rc, valid, k1, k1_rc, k1_valid = chop(seqs_d, lens_d)

    rows = routers.row.lookup(st.keys, st.n, deleted, kq, k=k)
    u = jnp.where(rows >= 0, 2 * rows + is_rc, -1)
    eid_g = routers.node.gather1(node_edge, u)
    # encode "dead/missing node" as -2 so barriers form correctly
    eid_flat = jnp.where(rows >= 0, jnp.where(eid_g >= 0, eid_g, -1),
                         -2)

    # the path logic is independent per read: run it per shard under
    # shard_map (patch table + edge twins replicated — O(edges)); the
    # chopped k-mer arrays never leave the mesh, only the (f, t, v)
    # preArc COO comes back (prlRead2path.c:817-1346's all-device
    # second read pass)
    tkey = (id(mesh), k, r_loc, l, int(patch.keys.shape[0]),
            int(eg.twin.shape[0]))
    tfn = _THREAD_STEP_CACHE.get(tkey)
    if tfn is None:
        def step(eid_s, valid_s, lens_s, k1_s, k1rc_s, k1v_s,
                 pk, pe, tw):
            return _thread_local(
                eid_s.reshape(-1), valid_s.reshape(-1),
                lens_s.reshape(-1),
                k1_s.reshape(-1, k1_s.shape[-1]), k1rc_s.reshape(-1),
                k1v_s.reshape(-1), (pk, pe, tw), r_loc, p, k)

        tfn = jax.jit(jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS),
                      P(AXIS, None, None), P(AXIS, None),
                      P(AXIS, None), P(None, None), P(None), P(None)),
            out_specs=(P(AXIS), P(AXIS), P(AXIS))))
        _THREAD_STEP_CACHE[tkey] = tfn
    f, t, v = tfn(eid_flat.reshape(d, -1), valid, lens_d,
                  k1, k1_rc, k1_valid,
                  patch.keys, patch.edge, eg.twin)
    return (np.asarray(f).reshape(-1), np.asarray(t).reshape(-1),
            np.asarray(v).reshape(-1))
