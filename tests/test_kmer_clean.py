"""K-mer-level cleaning (cutTipPreGraph.c equivalents): sequencing
errors must be scrubbed so the edge graph collapses back to the truth."""

import numpy as np
import pytest
import jax.numpy as jnp

from soapdenovo_trans_tpu.ops import bits, dictionary, kmer
from soapdenovo_trans_tpu.graph import dbg as dbg_mod
from soapdenovo_trans_tpu.graph import unitigs, kmer_clean

K = 15


def build_table(seqs, k=K):
    maxlen = max(len(s) for s in seqs)
    padded = np.full((len(seqs), maxlen), 4, np.uint8)
    lens = []
    for i, s in enumerate(seqs):
        padded[i, : len(s)] = bits.encode_seq(s)
        lens.append(len(s))
    stream = kmer.chop_reads(jnp.asarray(padded), jnp.asarray(lens), k)
    return dictionary.build(stream, k)


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


def mutate(s, pos):
    old = s[pos]
    new = "ACGT"[("ACGT".index(old) + 1) % 4]
    return s[:pos] + new + s[pos + 1 :]


def condensed_seqs(table, k=K):
    graph = dbg_mod.build_dbg(table, k)
    eg = unitigs.condense(graph, table, k)
    return unitigs.edge_sequences(eg, table, k)


def test_single_tip_clipped(rng):
    t = unique_kmer_seq(rng, 150)
    reads = [t[i : i + 60] for i in range(0, 91, 10)]  # clean tiling
    bad = mutate(t[40:100], 55)  # error 5bp from read end -> tip
    table = build_table(reads * 3 + [bad])
    # before cleaning: error kmers present -> more than 2 edges
    assert len(condensed_seqs(table)) > 2
    cleaned = kmer_clean.clip_tip_kmers(table, K)
    seqs = condensed_seqs(cleaned)
    assert sorted(seqs) == sorted([t, bits.revcomp_str(t)])


def test_minor_out_removes_weak_neighbor(rng):
    t = unique_kmer_seq(rng, 100)
    bad = mutate(t[30:80], 45)  # error near end of a 50bp read
    # heavy coverage on truth, single bad read
    table = build_table([t] * 25 + [bad])
    cleaned = kmer_clean.minor_out(table, K)
    # the first error kmer (branching off a 25x node) must be deleted
    deleted = np.asarray(cleaned.deleted)
    n_del = int(deleted.sum())
    assert n_del >= 1
    # and nothing from the true sequence may be deleted
    keys = np.asarray(cleaned.keys)
    true_cans = set()
    for j in range(len(t) - K + 1):
        win = t[j : j + K]
        true_cans.add(min(win, bits.revcomp_str(win)))
    for r in range(int(cleaned.n)):
        if deleted[r]:
            assert bits.kmer_to_string(keys[r], K) not in true_cans


def test_clean_graph_untouched(rng):
    t = unique_kmer_seq(rng, 120)
    reads = [t[i : i + 50] for i in range(0, 71, 7)]
    table = build_table(reads * 2)
    cleaned = kmer_clean.clip_tip_kmers(table, K)
    assert int(jnp.sum(cleaned.deleted)) == 0
