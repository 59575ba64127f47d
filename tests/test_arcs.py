"""Read->edge threading and preArc counting
(semantics of parse1read/thread_add1preArc, reference
src/prlRead2path.c, and add1Arc symmetrization, src/loadPreGraph.c)."""

import numpy as np
import pytest
import jax.numpy as jnp

from soapdenovo_trans_tpu.ops import bits, dictionary, kmer
from soapdenovo_trans_tpu.graph import dbg as dbg_mod
from soapdenovo_trans_tpu.graph import unitigs, arcs

K = 15


def pad_batch(seqs):
    maxlen = max(len(s) for s in seqs)
    padded = np.full((len(seqs), maxlen), 4, np.uint8)
    lens = []
    for i, s in enumerate(seqs):
        padded[i, : len(s)] = bits.encode_seq(s)
        lens.append(len(s))
    return jnp.asarray(padded), jnp.asarray(lens)


def build_all(seqs, k=K):
    padded, lens = pad_batch(seqs)
    stream = kmer.chop_reads(padded, lens, k)
    table = dictionary.build(stream, k)
    graph = dbg_mod.build_dbg(table, k)
    eg = unitigs.condense(graph, table, k)
    patch = arcs.build_patch(eg, table, k)
    f, t, v = arcs.thread_reads(padded, lens, table, eg, patch, k)
    aset = arcs.count_arcs(f, t, v, eg.twin)
    return table, eg, patch, aset


def arc_dict(aset):
    n = int(aset.n)
    return {
        (int(aset.from_ed[i]), int(aset.to_ed[i])): int(aset.mult[i])
        for i in range(n)
    }


def seq2edge(eg, table, k=K):
    return {s: e for e, s in enumerate(unitigs.edge_sequences(eg, table, k))}


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


def test_single_edge_no_arcs(rng):
    s = unique_kmer_seq(rng, 80)
    table, eg, patch, aset = build_all([s])
    assert int(aset.n) == 0


def test_y_branch_arcs(rng):
    p = unique_kmer_seq(rng, 60)
    a = "A" + unique_kmer_seq(rng, 30)
    b = "C" + unique_kmer_seq(rng, 30)
    t1, t2 = p + a, p + b
    table, eg, patch, aset = build_all([t1, t2])
    s2e = seq2edge(eg, table)
    eP = s2e[p]
    eA = s2e[t1[len(p) - K :]]
    eB = s2e[t2[len(p) - K :]]
    tw = np.asarray(eg.twin)
    d = arc_dict(aset)
    assert d.get((eP, eA)) == 1
    assert d.get((eP, eB)) == 1
    # symmetrized twins
    assert d.get((tw[eA], tw[eP])) == 1
    assert d.get((tw[eB], tw[eP])) == 1
    assert len(d) == 4


def test_multiplicity_counts(rng):
    p = unique_kmer_seq(rng, 60)
    a = "A" + unique_kmer_seq(rng, 30)
    b = "C" + unique_kmer_seq(rng, 30)
    reads = [p + a] * 3 + [p + b] * 2
    table, eg, patch, aset = build_all(reads)
    s2e = seq2edge(eg, table)
    d = arc_dict(aset)
    assert d[(s2e[p], s2e[(p + a)[len(p) - K :]])] == 3
    assert d[(s2e[p], s2e[(p + b)[len(p) - K :]])] == 2


def test_length1_edge_patch(rng):
    # Two prefixes converge into a shared (K+1)bp core, two suffixes
    # diverge: the core's 2 kmers are both vertices and form a
    # length-1 edge, traversable only via the (K+1)-mer patch table.
    while True:
        p1 = unique_kmer_seq(rng, 40)
        p2 = unique_kmer_seq(rng, 40)
        core = unique_kmer_seq(rng, K + 1)
        sa = "A" + unique_kmer_seq(rng, 25)
        sb = "C" + unique_kmer_seq(rng, 25)
        reads = [p1 + core + sa, p2 + core + sb,
                 p1 + core + sb, p2 + core + sa]
        # require all kmers globally unique across the construct
        allk = set()
        ok = True
        for s in reads[:2] + [reads[0]]:
            pass
        for s in [p1 + core + sa, p2 + core + sb]:
            for j in range(len(s) - K + 1):
                win = s[j : j + K]
                can = min(win, bits.revcomp_str(win))
                if can in allk and not (core in s and core.find(win) >= 0):
                    ok = False
                allk.add(can)
        if ok:
            break
    table, eg, patch, aset = build_all(reads)
    n = int(eg.n_edges)
    lens = np.asarray(eg.length[:n])
    assert (lens == 1).sum() == 2  # the core edge + its twin
    assert int(patch.n) >= 1
    s2e = seq2edge(eg, table)
    d = arc_dict(aset)
    # find the length-1 edge whose seq is the core
    e_core = s2e[core]
    # prefix edges end at core's first kmer
    e_p1 = s2e[p1 + core[:K]]
    e_sa = s2e[core[1:] + sa]
    assert d[(e_p1, e_core)] == 2  # p1 appears in 2 reads
    assert d[(e_core, e_sa)] == 2  # sa appears in 2 reads


def test_n_read_breaks_path(rng):
    p = unique_kmer_seq(rng, 60)
    a = "A" + unique_kmer_seq(rng, 30)
    b = "C" + unique_kmer_seq(rng, 30)
    # graph built from clean reads; threading read has N at the junction
    padded, lens = pad_batch([p + a, p + b])
    stream = kmer.chop_reads(padded, lens, K)
    table = dictionary.build(stream, K)
    graph = dbg_mod.build_dbg(table, K)
    eg = unitigs.condense(graph, table, K)
    patch = arcs.build_patch(eg, table, K)
    broken = p[:-1] + "N" + a  # N kills every window spanning junction
    padded2, lens2 = pad_batch([broken])
    f, t, v = arcs.thread_reads(padded2, lens2, table, eg, patch, K)
    aset = arcs.count_arcs(f, t, v, eg.twin)
    assert int(aset.n) == 0  # no arc may cross the N barrier


def test_merge_arcs_quantized_cap_exceeds_sources(monkeypatch):
    """pow2 capacity quantization can round the merged arc count past
    the concatenated source length; the ArcSet builders must pad, not
    slice (regression: broadcast crash in merge_arcs under
    CAP_MODE='pow2')."""
    from soapdenovo_trans_tpu.graph import arcs
    from soapdenovo_trans_tpu.ops import dictionary

    monkeypatch.setattr(dictionary, "CAP_MODE", "pow2")
    # a: 256 unique arcs tightly packed; b: 128 more -> n_tot = 384,
    # n_unique = 384, round_up(384) = 512 > 384
    fa = jnp.arange(256, dtype=jnp.int32)
    fb = jnp.arange(256, 384, dtype=jnp.int32)
    mk = lambda f: arcs.ArcSet(
        f, f, jnp.ones_like(f), jnp.int32(f.shape[0]))
    twin = jnp.arange(512, dtype=jnp.int32) ^ 1
    merged = mk(jnp.concatenate([fa, fb]))  # exercised via merge too
    out = arcs.merge_arcs(mk(fa), mk(fb), twin)
    assert int(out.n) == 384
    assert out.from_ed.shape[0] >= 384
    got = set(np.asarray(out.from_ed[: int(out.n)]).tolist())
    assert got == set(range(384))
