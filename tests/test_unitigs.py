"""de Bruijn graph + unitig condensation tests on hand-built cases
(behavioral parity with kmer2edges, reference src/node2edge.c)."""

import numpy as np
import pytest
import jax.numpy as jnp

from soapdenovo_trans_tpu.ops import bits, dictionary, kmer
from soapdenovo_trans_tpu.graph import dbg as dbg_mod
from soapdenovo_trans_tpu.graph import unitigs

K = 15


def assemble(seqs, k=K):
    maxlen = max(len(s) for s in seqs)
    padded = np.full((len(seqs), maxlen), 4, np.uint8)
    lens = []
    for i, s in enumerate(seqs):
        padded[i, : len(s)] = bits.encode_seq(s)
        lens.append(len(s))
    stream = kmer.chop_reads(jnp.asarray(padded), jnp.asarray(lens), k)
    table = dictionary.build(stream, k)
    graph = dbg_mod.build_dbg(table, k)
    eg = unitigs.condense(graph, table, k)
    return table, graph, eg


def unique_kmer_seq(rng, n, k=K):
    """Random sequence whose canonical k-mers are all distinct."""
    while True:
        s = "".join(rng.choice(list("ACGT"), size=n))
        cans = set()
        ok = True
        for j in range(n - k + 1):
            win = s[j : j + k]
            can = min(win, bits.revcomp_str(win))
            if can in cans:
                ok = False
                break
            cans.add(can)
        if ok:
            return s


def test_single_chain(rng):
    s = unique_kmer_seq(rng, 120)
    table, graph, eg = assemble([s])
    n = int(eg.n_edges)
    assert n == 2  # the unitig and its reverse-complement twin
    seqs = unitigs.edge_sequences(eg, table, K)
    assert sorted(seqs) == sorted([s, bits.revcomp_str(s)])
    lens = np.asarray(eg.length[:n])
    assert lens.tolist() == [120 - K, 120 - K]
    tw = np.asarray(eg.twin[:n])
    assert tw[0] == 1 and tw[1] == 0
    # single coverage => interior l_cov sums to 1 per node => cvg 10
    assert np.asarray(eg.cvg[:n]).tolist() == [10, 10]


def test_y_branch(rng):
    p = unique_kmer_seq(rng, 80)
    a = "A" + unique_kmer_seq(rng, 40)
    b = "C" + unique_kmer_seq(rng, 40)
    t1, t2 = p + a, p + b
    table, graph, eg = assemble([t1, t2])
    n = int(eg.n_edges)
    seqs = set(unitigs.edge_sequences(eg, table, K))
    # Expected unitigs: shared prefix P, then branch-suffixes starting
    # at the last kmer of P (branch vertex).
    expect = {p, t1[len(p) - K :], t2[len(p) - K :]}
    expect |= {bits.revcomp_str(s) for s in expect}
    if len(expect) == 6:
        assert n == 6
    assert seqs == expect
    # twin pairing is involutive and length-consistent
    tw = np.asarray(eg.twin[:n])
    ln = np.asarray(eg.length[:n])
    for e in range(n):
        assert tw[tw[e]] == e
        assert ln[tw[e]] == ln[e]


def test_cycle_break(rng):
    s = unique_kmer_seq(rng, 90)
    circular_read = s + s[: K - 1 + 1]  # wrap so every node is 1-in-1-out
    table, graph, eg = assemble([circular_read])
    n = int(eg.n_edges)
    # all-linear loop: broken at min arc id into one edge + twin
    assert n == 2
    lens = np.asarray(eg.length[:n])
    # every arc lands in exactly one edge
    n_arcs = int(jnp.sum(graph.exists))
    assert lens.sum() == n_arcs


def test_node_edge_positions(rng):
    s = unique_kmer_seq(rng, 60)
    table, graph, eg = assemble([s])
    node_edge = np.asarray(eg.node_edge)
    node_pos = np.asarray(eg.node_pos)
    seqs = unitigs.edge_sequences(eg, table, K)
    keys = np.asarray(table.keys)
    n_nodes = int(table.n)
    covered = 0
    for row in range(n_nodes):
        for strand in range(2):
            u = 2 * row + strand
            e, pos = node_edge[u], node_pos[u]
            if e < 0:
                continue
            covered += 1
            km = bits.kmer_to_string(keys[row], K)
            if strand:
                km = bits.revcomp_str(km)
            # interior node at pos occupies bases [pos, pos+K) of edge seq
            assert seqs[e][pos : pos + K] == km, (u, e, pos)
    # all interior nodes mapped: chain of L nodes has L-2 interiors, x2
    assert covered == 2 * (60 - K + 1 - 2)


def test_coverage_scaling(rng):
    s = unique_kmer_seq(rng, 100)
    table, graph, eg = assemble([s] * 7)  # 7x coverage
    n = int(eg.n_edges)
    assert n == 2
    assert np.asarray(eg.cvg[:n]).tolist() == [70, 70]
