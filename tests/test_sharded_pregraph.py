"""Sharded pregraph passes vs their dense twins
(parallel/sharded_pregraph.py vs graph/{dbg,kmer_clean,unitigs,arcs}).

Each test builds the same k-mer table twice — dense and split over the
8-device CPU mesh — and asserts the passes agree exactly (up to id
renaming, compared through decoded sequences)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from soapdenovo_trans_tpu.graph import arcs as arcs_mod
from soapdenovo_trans_tpu.graph import dbg as dbg_mod
from soapdenovo_trans_tpu.graph import kmer_clean, unitigs
from soapdenovo_trans_tpu.ops import bits, dictionary, kmer
from soapdenovo_trans_tpu.parallel import (sharded_count, sharded_graph,
                                           sharded_pregraph)

D = 8
K = 13
ALPH = "ACGT"


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    return Mesh(np.array(devs[:D]), (sharded_graph.AXIS,))


def random_reads(rng, n_transcripts=3, t_len=150, read_len=36, step=2,
                 with_tips=True):
    """Reads tiling random transcripts, plus a few 1x tip reads."""
    reads = []
    for _ in range(n_transcripts):
        t = "".join(ALPH[i] for i in rng.integers(0, 4, t_len))
        for i in range(0, t_len - read_len + 1, step):
            r = t[i:i + read_len]
            reads.append(bits.revcomp_str(r) if rng.random() < 0.5 else r)
        if with_tips:
            # a single-copy erroneous read hanging off the transcript
            pos = int(rng.integers(0, t_len - read_len))
            err = list(t[pos:pos + read_len])
            err[-3] = ALPH[(ALPH.index(err[-3]) + 1) % 4]
            reads.append("".join(err))
    rng.shuffle(reads)
    return reads


def encode_batch(reads, read_len):
    codes = np.full((len(reads), read_len), 4, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, :len(r)] = bits.encode_seq(r)
        lens[i] = len(r)
    return codes, lens


def dense_table(reads, read_len):
    codes, lens = encode_batch(reads, read_len)
    stream = kmer.chop_reads(jnp.asarray(codes), jnp.asarray(lens), K)
    return dictionary.build(stream, K), codes, lens


def split_table(table):
    """Dense KmerTable -> (ShardedTable-like arrays, gid map)."""
    n = int(table.n)
    keys = np.asarray(table.keys)[:n]
    count = np.asarray(table.count)[:n]
    l_cov = np.asarray(table.l_cov)[:n]
    r_cov = np.asarray(table.r_cov)[:n]
    bounds = sharded_count._owner_boundaries(K, D)
    owner = np.searchsorted(bounds, keys[:, 0], side="right")
    cap = dictionary.round_up(max(np.bincount(owner, minlength=D).max(), 1))
    w = keys.shape[1]
    sk = np.full((D, cap, w), 0xFFFFFFFF, np.uint32)
    sc = np.zeros((D, cap), np.int32)
    sl = np.zeros((D, cap, 4), np.int32)
    sr = np.zeros((D, cap, 4), np.int32)
    ns = np.zeros(D, np.int32)
    gid = np.zeros(n, np.int64)
    for i in range(n):
        o = owner[i]
        sk[o, ns[o]] = keys[i]
        sc[o, ns[o]] = count[i]
        sl[o, ns[o]] = l_cov[i]
        sr[o, ns[o]] = r_cov[i]
        gid[i] = o * cap + ns[o]
        ns[o] += 1
    st = sharded_count.ShardedTable(
        jnp.asarray(sk), jnp.asarray(sc), jnp.asarray(sl),
        jnp.asarray(sr), jnp.asarray(ns))
    return st, gid, cap


def test_dbg_matches_dense(mesh, rng):
    reads = random_reads(np.random.default_rng(3))
    table, _, _ = dense_table(reads, 36)
    st, gid, cap = split_table(table)
    routers = sharded_pregraph.Routers.build(mesh, cap)
    deleted = jnp.zeros((D, cap), jnp.int32)
    sdbg = sharded_pregraph.build_dbg_sharded(mesh, routers, st,
                                              deleted, K)
    ddbg = dbg_mod.build_dbg(table, K)

    n = int(table.n)
    s_exists = np.asarray(sdbg.exists).reshape(D, -1, 2, 4)
    s_succ = np.asarray(sdbg.succ).reshape(D, -1, 2, 4)
    s_deg = np.asarray(sdbg.out_deg).reshape(D, -1, 2)
    s_lin = np.asarray(sdbg.linear).reshape(D, -1, 2)
    d_exists = np.asarray(ddbg.exists).reshape(-1, 2, 4)
    d_succ = np.asarray(ddbg.succ).reshape(-1, 2, 4)
    d_deg = np.asarray(ddbg.out_deg).reshape(-1, 2)
    d_lin = np.asarray(ddbg.linear).reshape(-1, 2)
    # dense directed id -> global directed id
    def to_global(u):
        return np.where(
            u >= 0, 2 * gid[np.maximum(u, 0) >> 1] + (u & 1), -1)

    for i in range(n):
        s, loc = divmod(gid[i], cap)
        np.testing.assert_array_equal(s_exists[s, loc], d_exists[i],
                                      err_msg=f"exists row {i}")
        np.testing.assert_array_equal(s_deg[s, loc], d_deg[i])
        np.testing.assert_array_equal(s_lin[s, loc], d_lin[i])
        want = np.where(d_exists[i], to_global(d_succ[i]), -1)
        got = np.where(s_exists[s, loc], s_succ[s, loc], -1)
        np.testing.assert_array_equal(got, want, err_msg=f"succ row {i}")


def test_tip_clip_matches_dense(mesh, rng):
    reads = random_reads(np.random.default_rng(5))
    table, _, _ = dense_table(reads, 36)
    st, gid, cap = split_table(table)
    routers = sharded_pregraph.Routers.build(mesh, cap)
    deleted = sharded_pregraph.clip_tip_kmers_sharded(
        mesh, routers, st, jnp.zeros((D, cap), jnp.int32), K)
    dt = kmer_clean.clip_tip_kmers(table, K)

    n = int(table.n)
    d_del = np.asarray(dt.deleted)[:n]
    s_del = np.asarray(deleted)
    got = np.array([s_del[gid[i] // cap, gid[i] % cap] > 0
                    for i in range(n)])
    np.testing.assert_array_equal(got, d_del)


def edge_seq_set(eg, table, k):
    seqs = unitigs.edge_sequences(eg, table, k)
    return sorted(seqs)


def test_condense_matches_dense(mesh, rng):
    reads = random_reads(np.random.default_rng(11), with_tips=False)
    table, _, _ = dense_table(reads, 36)
    st, gid, cap = split_table(table)
    routers = sharded_pregraph.Routers.build(mesh, cap)
    deleted = jnp.zeros((D, cap), jnp.int32)
    seg, stab, node_edge, node_pos = sharded_pregraph.condense_sharded(
        mesh, routers, st, deleted, K)

    ddbg = dbg_mod.build_dbg(table, K)
    deg = unitigs.condense(ddbg, table, K)

    assert int(seg.n_edges) == int(deg.n_edges)
    assert edge_seq_set(seg, stab, K) == edge_seq_set(deg, table, K)
    # twin consistency: twin edge's sequence is the revcomp
    seqs = unitigs.edge_sequences(seg, stab, K)
    tw = np.asarray(seg.twin)
    for e in range(int(seg.n_edges)):
        t = int(tw[e])
        assert 0 <= t < int(seg.n_edges)
        assert seqs[t] == bits.revcomp_str(seqs[e]), e
    # cvg parity via sequence keys
    d_seqs = unitigs.edge_sequences(deg, table, K)
    d_cvg = {s: int(c) for s, c in zip(d_seqs, np.asarray(deg.cvg))}
    s_cvg = np.asarray(seg.cvg)
    for e, s in enumerate(seqs):
        assert int(s_cvg[e]) == d_cvg[s], s


def test_thread_reads_matches_dense(mesh, rng):
    reads = random_reads(np.random.default_rng(17), with_tips=False)
    table, codes, lens = dense_table(reads, 36)
    st, gid, cap = split_table(table)
    routers = sharded_pregraph.Routers.build(mesh, cap)
    deleted = jnp.zeros((D, cap), jnp.int32)
    seg, stab, node_edge, node_pos = sharded_pregraph.condense_sharded(
        mesh, routers, st, deleted, K)
    s_patch = arcs_mod.build_patch(seg, stab, K)

    ddbg = dbg_mod.build_dbg(table, K)
    deg = unitigs.condense(ddbg, table, K)
    d_patch = arcs_mod.build_patch(deg, table, K)

    r = codes.shape[0]
    if r % D:
        pad = D - r % D
        codes = np.concatenate([codes, np.full((pad, 36), 4, np.uint8)])
        lens = np.concatenate([lens, np.zeros(pad, np.int32)])
    sf, st_, sv = sharded_pregraph.thread_reads_sharded(
        mesh, routers, st, deleted, node_edge, node_pos, seg, s_patch,
        codes, lens, K)
    df, dt_, dv = arcs_mod.thread_reads(
        jnp.asarray(codes), jnp.asarray(lens), table, deg, d_patch, K)

    s_seqs = unitigs.edge_sequences(seg, stab, K)
    d_seqs = unitigs.edge_sequences(deg, table, K)

    def arc_multiset(f, t, v, seqs):
        f, t, v = np.asarray(f), np.asarray(t), np.asarray(v)
        out = {}
        for i in np.nonzero(v)[0]:
            key = (seqs[f[i]], seqs[t[i]])
            out[key] = out.get(key, 0) + 1
        return out

    assert arc_multiset(sf, st_, sv, s_seqs) == \
        arc_multiset(df, dt_, dv, d_seqs)


@pytest.mark.slow
def test_condense_sharded_1e7_host_memory(mesh):
    """Mesh residency at scale: condense >=1e7 k-mers on the 8-device
    mesh and assert host-side (numpy/python) allocations stay
    O(edges), NOT O(table): the pre-r4 implementation materialized
    (D, 8*cap) rank/succ/exists arrays on the host (~320MB+ each at
    this size); the routed version's host peak is the final EdgeGraph
    gather (seq pool ~ total edge length, here ~10MB).

    tracemalloc sees numpy/python allocations but not XLA device
    buffers — exactly the boundary the residency contract draws."""
    import tracemalloc

    k = 31
    n_bases = 10_000_000
    rng = np.random.default_rng(3)
    # ~1e7 distinct k-mers in a handful of long random transcripts
    # (random 31-mers essentially never collide at this scale)
    n_tx = 8
    t_len = n_bases // n_tx
    codes = rng.integers(0, 4, size=(n_tx, t_len), dtype=np.uint8)
    lens = np.full(n_tx, t_len, np.int32)
    stream = kmer.chop_reads(jnp.asarray(codes), jnp.asarray(lens), k)
    table = dictionary.build(stream, k)
    n = int(table.n)
    assert n >= 9_900_000, n

    # vectorized prefix split (keys are sorted; owners are contiguous)
    keys = np.asarray(table.keys[:n])
    count = np.asarray(table.count[:n])
    l_cov = np.asarray(table.l_cov[:n])
    r_cov = np.asarray(table.r_cov[:n])
    bounds = sharded_count._owner_boundaries(k, D)
    splits = np.searchsorted(keys[:, 0], bounds, side="left")
    starts = np.r_[0, splits, n]
    per = np.diff(starts)
    cap = dictionary.round_up(int(per.max()))
    w = keys.shape[1]
    sk = np.full((D, cap, w), 0xFFFFFFFF, np.uint32)
    sc = np.zeros((D, cap), np.int32)
    sl = np.zeros((D, cap, 4), np.int32)
    sr = np.zeros((D, cap, 4), np.int32)
    for s in range(D):
        a, b = starts[s], starts[s + 1]
        sk[s, : b - a] = keys[a:b]
        sc[s, : b - a] = count[a:b]
        sl[s, : b - a] = l_cov[a:b]
        sr[s, : b - a] = r_cov[a:b]
    st = sharded_count.ShardedTable(
        jnp.asarray(sk), jnp.asarray(sc), jnp.asarray(sl),
        jnp.asarray(sr), jnp.asarray(per.astype(np.int32)))
    del keys, count, l_cov, r_cov, sk, sc, sl, sr

    routers = sharded_pregraph.Routers.build(mesh, cap)
    deleted = jnp.zeros((D, cap), jnp.int32)
    tracemalloc.start()
    seg, stab, node_edge, node_pos = sharded_pregraph.condense_sharded(
        mesh, routers, st, deleted, k)
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    # every transcript survives as one edge pair; total edge length
    # accounts for all interior k-mers
    n_edges = int(seg.n_edges)
    assert n_edges == 2 * n_tx, n_edges
    total_len = int(np.asarray(seg.length[:n_edges]).sum())
    n_nodes = t_len - k + 1  # per transcript per direction
    assert 2 * n_tx * (n_nodes - 2) <= total_len <= 2 * n_tx * n_nodes
    # host peak stays O(assembled bases), far below table-sized: the
    # legitimate transfers are the u8 seq-pool read-back (~1 B/base)
    # plus small O(edges) arrays; the pre-r4 host path materialized
    # several (D, 8cap) int32/int64 arrays (>= 32 B per k-mer slot).
    table_sized = D * 8 * cap * 4
    pool_budget = 3 * total_len + (32 << 20)
    assert peak < pool_budget, (peak, pool_budget)
    assert pool_budget < table_sized // 2, "fixture too small to " \
        "distinguish pool-sized from table-sized"
