"""Bubble pinching (reference bubblePinch, src/bubble.c) — SNP/error
bubbles collapse onto the majority branch."""

import numpy as np
import pytest
import jax.numpy as jnp

from soapdenovo_trans_tpu.ops import bits, dictionary, kmer
from soapdenovo_trans_tpu.graph import dbg as dbg_mod
from soapdenovo_trans_tpu.graph import arcs, bubbles, contig_merge, unitigs

K = 15


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


def build(reads, k=K):
    maxlen = max(len(s) for s in reads)
    padded = np.full((len(reads), maxlen), 4, np.uint8)
    lens = []
    for i, s in enumerate(reads):
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


def snp_variant(t, pos):
    old = t[pos]
    new = "ACGT"[("ACGT".index(old) + 2) % 4]
    return t[:pos] + new + t[pos + 1 :]


def test_snp_bubble_merged(rng):
    t = unique_kmer_seq(rng, 200)
    v = snp_variant(t, 100)
    reads = [t] * 9 + [v] * 3  # both branches above error thresholds
    table, eg, aset = build(reads)
    assert int(eg.n_edges) == 8  # 4 pairs: prefix, 2 branches, suffix
    eg2, aset2 = bubbles.bubble_pinch(eg, aset, table, K, 1)
    alive = [e for e in range(int(eg2.n_edges))
             if not bool(eg2.deleted[e])]
    assert len(alive) == 6  # minority branch pair removed
    # after concatenation the majority transcript is restored whole
    ctg = contig_merge.concatenate(eg2, aset2)
    seqs = contig_merge.contig_sequences(ctg, table, K)
    assert sorted(seqs) == sorted([t, bits.revcomp_str(t)])
    # coverage of the surviving branch absorbed the minority's
    n = int(eg.n_edges)


def test_distinct_sequences_not_merged(rng):
    # two genuinely different paths between the same vertices (an
    # alternative exon, length difference > DIFF) must survive
    p = unique_kmer_seq(rng, 80)
    mid1 = unique_kmer_seq(rng, 40)
    mid2 = unique_kmer_seq(rng, 60)
    q = unique_kmer_seq(rng, 80)
    t1, t2 = p + mid1 + q, p + mid2 + q
    reads = [t1] * 5 + [t2] * 5
    table, eg, aset = build(reads)
    n_before = int(jnp.sum(~eg.deleted[: int(eg.n_edges)]))
    eg2, aset2 = bubbles.bubble_pinch(eg, aset, table, K, 1)
    n_after = int(jnp.sum(~eg2.deleted[: int(eg2.n_edges)]))
    assert n_after == n_before  # nothing merged


def test_pinch_in_contig_stage(rng):
    # through run_contig with merge_level=1: error reads form a bubble
    # (error mid-read far from ends), output must be the clean t
    from soapdenovo_trans_tpu.stages import contig as contig_stage

    t = unique_kmer_seq(rng, 200)
    v = snp_variant(t, 90)
    reads = [t] * 10 + [v] * 3
    table, eg, aset = build(reads)
    params = contig_stage.ContigParams(merge_level=1, weak_cvg=0)
    ctg = contig_stage.run_contig(eg, aset, K, params, table=table)
    seqs = contig_merge.contig_sequences(ctg, table, K)
    assert sorted(seqs) == sorted([t, bits.revcomp_str(t)])


def _multinode_bubble_reads(rng, n_maj=9, n_min=3):
    """A bubble whose majority branch is split into TWO edges by a
    side spur — only a multi-node-path Tour-Bus (comparePaths walking
    previous[] chains, bubble.c:1766) can pinch it; the parallel-edge
    fast path cannot (different from-nodes)."""
    t = unique_kmer_seq(rng, 260)
    p, m, s = t[:100], t[100:160], t[160:]
    # minority: one SNP in the middle of m
    v = p + snp_variant(m, 30)[0:60] + s
    # spur: shares a K-window INSIDE the bubble's differing region
    # (windows covering m[30] start at m[16..30]) then diverges,
    # splitting the majority branch into two edges at the junction
    spur = m[17:17 + K] + unique_kmer_seq(rng, 40)
    reads = [t] * n_maj + [v] * n_min + [spur] * 5
    return t, v, spur, reads


def test_multinode_bubble_merged():
    rng = np.random.default_rng(7)
    t, v, spur, reads = _multinode_bubble_reads(rng)
    table, eg, aset = build(reads)
    from soapdenovo_trans_tpu.graph import tourbus
    if not tourbus.available():
        pytest.skip("native tourbus unavailable")
    eg2, aset2, stats = tourbus.pinch(eg, aset, K, 1)
    assert stats["merged"] >= 1, stats
    # minority branch gone: concatenating yields the majority
    # transcript (with the spur still attached as a tip)
    ctg = contig_merge.concatenate(eg2, aset2)
    seqs = contig_merge.contig_sequences(ctg, table, K)
    canon = {min(x, bits.revcomp_str(x)) for x in seqs}
    assert not any(
        v[95:175] in x or bits.revcomp_str(v[95:175]) in x for x in canon
    ), "minority branch survived"


def test_multinode_bubble_maxnodelength():
    """MAXNODELENGTH bounds the backtrack: a minority path needing a
    >MAXNODELENGTH walk on the majority side is not pinched at -M 1
    (limit 3) but is at -M 3 (limit 30) — the majority branch is
    split into 5+ edges by spurs (bubble.c:2072-2086 semantics)."""
    rng = np.random.default_rng(11)
    t = unique_kmer_seq(rng, 400)
    p, m, s = t[:100], t[100:300], t[300:]
    # SNPs < K apart chain the differing k-mer windows into ONE
    # contiguous bubble region (m[46..105)) -> a single bubble, not
    # a cascade of independent one-node bubbles
    v_m = m
    for pos in (60, 70, 80, 90):
        v_m = snp_variant(v_m, pos)
    v = p + v_m + s
    # spurs whose K-window contains a SNP share sequence with the
    # MAJORITY branch only -> each junction splits the majority
    # branch (minority stays one edge); 4 junctions -> 5 edges
    spurs = [m[off:off + K] + unique_kmer_seq(rng, 40)
             for off in (48, 58, 68, 78)]
    reads = [t] * 9 + [v] * 3
    for sp in spurs:
        reads += [sp] * 5
    table, eg, aset = build(reads)
    from soapdenovo_trans_tpu.graph import tourbus
    if not tourbus.available():
        pytest.skip("native tourbus unavailable")
    # majority middle now 5 edges; slow path (2 edges after its own
    # split? no spurs on it -> 1 edge) needs fast walk of 5 > 3
    eg1, a1, st1 = tourbus.pinch(eg, aset, K, 1)
    eg3, a3, st3 = tourbus.pinch(eg, aset, K, 3)
    # -M 1 (MAXNODELENGTH 3) must refuse the >3-node majority walk;
    # -M 3 (MAXNODELENGTH 30) must accept and pinch the bubble.
    assert st1["merged"] == 0, st1
    assert st3["merged"] >= 1, st3


@pytest.mark.slow
def test_many_simultaneous_bubbles_all_merged():
    """>10^4 simultaneous SNP bubbles must ALL pinch — the fixpoint
    loop drains candidate overflow across waves instead of stopping
    at a wave cap (bubble.c:2123-2126's HasChanged fixpoint)."""
    from soapdenovo_trans_tpu.graph import tourbus

    rng = np.random.default_rng(99)
    k = 23
    n_bub = 10_500
    spacing = 100
    t = "".join(rng.choice(list("ACGT"), size=n_bub * spacing + 200))
    v = list(t)
    for i in range(n_bub):
        pos = 100 + i * spacing
        v[pos] = "ACGT"[("ACGT".index(v[pos]) + 2) % 4]
    v = "".join(v)
    reads = [t] * 3 + [v]  # majority 3x, minority 1x per bubble
    table, eg, aset = build(reads, k=k)
    eg2, aset2, stats = tourbus.pinch(eg, aset, k, 1)
    # random 1Mbp at K=23 has no repeated k-mers in practice; every
    # SNP is an independent 1-node bubble and every one must merge
    assert stats["merged"] >= int(0.99 * n_bub), stats
    alive2 = int(jnp.sum(~eg2.deleted[: int(eg2.n_edges)]))
    alive0 = int(jnp.sum(~eg.deleted[: int(eg.n_edges)]))
    assert alive0 - alive2 == 2 * stats["merged"]  # twin pairs deleted
