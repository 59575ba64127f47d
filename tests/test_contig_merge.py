"""linearConcatenate equivalence tests
(reference src/concatenateEdge.c:227-296 semantics)."""

import numpy as np
import pytest
import jax.numpy as jnp

from soapdenovo_trans_tpu.ops import bits, dictionary, kmer
from soapdenovo_trans_tpu.graph import dbg as dbg_mod
from soapdenovo_trans_tpu.graph import unitigs, arcs, contig_merge

K = 15


def build_all(seqs, k=K):
    maxlen = max(len(s) for s in seqs)
    padded = np.full((len(seqs), maxlen), 4, np.uint8)
    lens = []
    for i, s in enumerate(seqs):
        padded[i, : len(s)] = bits.encode_seq(s)
        lens.append(len(s))
    padded = jnp.asarray(padded)
    lens = jnp.asarray(lens)
    stream = kmer.chop_reads(padded, lens, k)
    table = dictionary.build(stream, k)
    graph = dbg_mod.build_dbg(table, k)
    eg = unitigs.condense(graph, table, k)
    patch = arcs.build_patch(eg, table, k)
    f, t, v = arcs.thread_reads(padded, lens, table, eg, patch, k)
    aset = arcs.count_arcs(f, t, v, eg.twin)
    return table, eg, aset


def unique_kmer_seq(rng, n, k=K):
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


def test_branch_blocks_merge(rng):
    p = unique_kmer_seq(rng, 60)
    t1 = p + "A" + unique_kmer_seq(rng, 30)
    t2 = p + "C" + unique_kmer_seq(rng, 30)
    table, eg, aset = build_all([t1, t2])
    ctg = contig_merge.concatenate(eg, aset)
    # nothing merges across a real branch: contigs == edges
    assert int(ctg.n) == int(eg.n_edges)
    assert sorted(contig_merge.contig_sequences(ctg, table, K)) == \
        sorted(unitigs.edge_sequences(eg, table, K))


def test_merge_after_tip_deletion(rng):
    p = unique_kmer_seq(rng, 60)
    sufa = "A" + unique_kmer_seq(rng, 30)
    t1 = p + sufa
    t2 = p + "C" + unique_kmer_seq(rng, 20)  # the "tip" path
    table, eg, aset = build_all([t1, t1, t2])
    n = int(eg.n_edges)
    seqs = unitigs.edge_sequences(eg, table, K)
    tw = np.asarray(eg.twin)
    # delete the t2-branch edge and its twin
    tip_seq = t2[len(p) - K :]
    tip = next(e for e, s in enumerate(seqs)
               if s in (tip_seq, bits.revcomp_str(tip_seq)))
    deleted = np.zeros(eg.length.shape[0], bool)
    deleted[tip] = deleted[tw[tip]] = True
    eg2 = eg._replace(deleted=jnp.asarray(deleted))
    ctg = contig_merge.concatenate(eg2, aset)
    out = contig_merge.contig_sequences(ctg, table, K)
    assert int(ctg.n) == 2
    assert sorted(out) == sorted([t1, bits.revcomp_str(t1)])
    # coverage: length-weighted mean of member edges, remapped arcs empty
    assert int(ctg.arcs.n) == 0


def test_transitive_three_way_merge(rng):
    # main transcript with two spur branches; deleting both spurs must
    # collapse the 3-segment chain in ONE concatenate call
    while True:
        t = unique_kmer_seq(rng, 150)
        if t[50] != "A" and t[100] != "C":  # spur starts must diverge
            break
    spur1 = t[50 - K : 50] + "A" + unique_kmer_seq(rng, 20)
    spur2 = t[100 - K : 100] + "C" + unique_kmer_seq(rng, 20)
    table, eg, aset = build_all([t, t, spur1, spur2])
    seqs = unitigs.edge_sequences(eg, table, K)
    tw = np.asarray(eg.twin)
    deleted = np.zeros(eg.length.shape[0], bool)
    for e, s in enumerate(seqs):
        if s not in (t, bits.revcomp_str(t)) and \
           s not in t and bits.revcomp_str(s) not in t:
            deleted[e] = deleted[tw[e]] = True
    eg2 = eg._replace(deleted=jnp.asarray(deleted))
    ctg = contig_merge.concatenate(eg2, aset)
    out = contig_merge.contig_sequences(ctg, table, K)
    assert sorted(out) == sorted([t, bits.revcomp_str(t)])


def test_remapped_arcs(rng):
    # X-shape: two prefixes -> (K+1) core -> two suffixes.  Nothing can
    # merge (core has 2-in/2-out); arcs must remap 1:1 onto contigs.
    p1 = unique_kmer_seq(rng, 40)
    p2 = unique_kmer_seq(rng, 40)
    core = unique_kmer_seq(rng, K + 1)
    sa = "A" + unique_kmer_seq(rng, 25)
    sb = "C" + unique_kmer_seq(rng, 25)
    reads = [p1 + core + sa, p2 + core + sb, p1 + core + sb, p2 + core + sa]
    table, eg, aset = build_all(reads)
    ctg = contig_merge.concatenate(eg, aset)
    assert int(ctg.n) == int(eg.n_edges)
    assert int(ctg.arcs.n) == int(aset.n)
