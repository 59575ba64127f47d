"""Map stage: read -> contig placement voting
(reference parse1read, src/prlRead2Ctg.c:233-354)."""

import numpy as np
import pytest
import jax.numpy as jnp

from soapdenovo_trans_tpu.ops import bits, dictionary, kmer
from soapdenovo_trans_tpu.graph import dbg as dbg_mod
from soapdenovo_trans_tpu.graph import unitigs, arcs, contig_merge
from soapdenovo_trans_tpu.stages import map as map_stage

K = 15


def unique_kmer_seq(rng, n, k=K, taken=None):
    """Random sequence whose canonical k-mers are unique — also vs the
    (mutated) ``taken`` set, so multi-sequence fixtures can guarantee
    no accidental cross-sequence repeats (the session-scoped rng means
    suite order changes the stream; collisions must be impossible, not
    merely unlikely)."""
    while True:
        s = "".join(rng.choice(list("ACGT"), size=n))
        cans = set()
        ok = True
        for j in range(n - k + 1):
            win = s[j : j + k]
            can = min(win, bits.revcomp_str(win))
            if can in cans or (taken is not None and can in taken):
                ok = False
                break
            cans.add(can)
        if ok:
            if taken is not None:
                taken |= cans
            return s


def assemble_contigs(seqs, k=K):
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
    ctg = contig_merge.concatenate(eg, aset)
    return table, ctg


def pad(reads):
    maxlen = max(len(s) for s in reads)
    padded = np.full((len(reads), maxlen), 4, np.uint8)
    lens = []
    for i, s in enumerate(reads):
        padded[i, : len(s)] = bits.encode_seq(s)
        lens.append(len(s))
    return jnp.asarray(padded), jnp.asarray(lens)


def test_exact_placement(rng):
    t = unique_kmer_seq(rng, 200)
    table, ctg = assemble_contigs([t])
    index = map_stage.build_contig_index(ctg, table, K)
    seqs = contig_merge.contig_sequences(ctg, table, K)
    # which contig row is the forward (t) one?
    fwd = 0 if seqs[0] == t else 1
    reads = [t[30:80], t[100:150], bits.revcomp_str(t[50:100])]
    padded, lens = pad(reads)
    pl = map_stage.map_reads(padded, lens, index, K, map_len=32)
    ctgs = np.asarray(pl.ctg)
    poss = np.asarray(pl.pos)
    revs = np.asarray(pl.reverse)
    # forward reads: mapped to some strand with consistent position
    for i, expect_pos in enumerate([30, 100]):
        c = ctgs[i]
        assert c >= 0
        cseq = seqs[c]
        L = len(reads[i])
        assert cseq[poss[i] : poss[i] + L] == reads[i], (i, poss[i])
    # rc read maps too, position consistent on whichever strand chosen
    c = ctgs[2]
    assert c >= 0
    assert seqs[c][poss[2] : poss[2] + 50] == reads[2]


def test_multi_not_met(rng):
    t = unique_kmer_seq(rng, 200)
    table, ctg = assemble_contigs([t])
    index = map_stage.build_contig_index(ctg, table, K)
    # read with only 3 matching kmers (17bp: 3 kmers < multi 5)
    reads = [t[30:47]]
    padded, lens = pad(reads)
    pl = map_stage.map_reads(padded, lens, index, K, map_len=32)
    assert int(pl.ctg[0]) == -1


def _y_branch_fixture(rng):
    """p + {A,C} + branch with NO accidental repeats anywhere.

    unique_kmer_seq guards each piece's own windows, but the
    junction-SPANNING windows (suffix of p + joint base + branch
    prefix) are only determined after concatenation — verify the full
    canonical k-mer multiset and regenerate on any collision, so the
    graph is a clean Y regardless of the session rng stream position.
    """
    from collections import Counter

    while True:
        taken = set()
        p = unique_kmer_seq(rng, 80, taken=taken)
        t1 = p + "A" + unique_kmer_seq(rng, 40, taken=taken)
        t2 = p + "C" + unique_kmer_seq(rng, 40, taken=taken)
        cnt = Counter()
        for t in (t1, t2):
            for j in range(len(t) - K + 1):
                w = t[j : j + K]
                cnt[min(w, bits.revcomp_str(w))] += 1
        p_kmers = {
            min(p[j : j + K], bits.revcomp_str(p[j : j + K]))
            for j in range(len(p) - K + 1)
        }
        # only kmers fully inside the shared prefix p may occur twice
        if all(c == 1 or (c == 2 and km in p_kmers)
               for km, c in cnt.items()):
            return p, t1, t2


def _canon_str(w):
    """Canonical form in CODE space (A0 C1 T2 G3 — reference int2base
    order), NOT ASCII min: stored keys are numeric minima, and ASCII
    min(w, rc) disagrees whenever G/T ordering decides."""
    rc = bits.revcomp_str(w)
    fw = [bits.BASE_CHARS.index(c) for c in w]
    bw = [bits.BASE_CHARS.index(c) for c in rc]
    return w if fw <= bw else rc


def test_ambiguous_kmers_dropped(rng):
    # Y-branch: the junction vertex kmer ends contig P and starts both
    # branch contigs -> occurs multiple times -> ambiguous -> dropped
    p, t1, t2 = _y_branch_fixture(rng)
    table, ctg = assemble_contigs([t1, t2])
    index = map_stage.build_contig_index(ctg, table, K)
    n = int(index.n)
    keys = np.asarray(index.keys[:n])
    idx_kmers = {bits.kmer_to_string(keys[i], K) for i in range(n)}
    junction = p[-K:]
    assert _canon_str(junction) not in idx_kmers
    # a mid-P kmer occurs once and IS in the index
    mid = p[30 : 30 + K]
    assert _canon_str(mid) in idx_kmers


def test_footprint_gap_spanning(rng):
    # a read overlapping two contigs qualifies on both -> footprint
    taken = set()
    t1 = unique_kmer_seq(rng, 120, taken=taken)
    t2 = unique_kmer_seq(rng, 120, taken=taken)
    table, ctg = assemble_contigs([t1, t2])
    index = map_stage.build_contig_index(ctg, table, K)
    read = t1[-30:] + t2[:30]  # 30bp on each: 16 kmers per side
    padded, lens = pad([read])
    pl = map_stage.map_reads(padded, lens, index, K, map_len=60)
    # with map_len=60, multi = max(5, 60-15+1)=46 > 16 => no single map
    assert int(pl.ctg[0]) == -1
    pl2 = map_stage.map_reads(padded, lens, index, K, map_len=20)
    # multi = max(5, 20-15+1)=6 <= 16 votes per side => qualify on both
    assert bool(pl2.footprint[0])
    assert int(pl2.ctg[0]) >= 0


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8, reason="needs 8 devices")
def test_sharded_map_matches_dense(rng):
    """map_reads_sharded == map_reads on every ReadPlacements field
    (prlRead2Ctg.c:656 threads this pass; the mesh twin must be a
    drop-in): placements, groups, footprints, raw coordinates."""
    import jax
    from jax.sharding import Mesh
    from soapdenovo_trans_tpu.parallel import sharded_map

    taken = set()
    t1 = unique_kmer_seq(rng, 300, taken=taken)
    t2 = unique_kmer_seq(rng, 250, taken=taken)
    table, ctg = assemble_contigs([t1, t2])
    index = map_stage.build_contig_index(ctg, table, K)

    reads = []
    for t in (t1, t2):
        for i in range(0, len(t) - 50 + 1, 7):
            r = t[i : i + 50]
            reads.append(bits.revcomp_str(r) if rng.random() < 0.5
                         else r)
    reads.append(t1[10:27])              # below multi threshold
    reads.append(t1[-40:] + t2[:40])     # chimeric: two contigs
    padded, lens = pad(reads)
    dense = map_stage.map_reads(padded, lens, index, K, map_len=32)

    mesh = Mesh(np.array(jax.devices()[:8]), (sharded_map.AXIS,))
    sidx = sharded_map.shard_index(mesh, index, K)
    # non-multiple-of-D row count exercises the padding path
    sh = sharded_map.map_reads_sharded(
        mesh, sidx, np.asarray(padded), np.asarray(lens), K,
        map_len=32)
    for f in map_stage.ReadPlacements._fields:
        a, b = np.asarray(getattr(dense, f)), np.asarray(getattr(sh, f))
        if f.startswith("g_"):
            # group slots are per-read-local; compare only valid ones
            va = np.asarray(dense.g_valid)
            vb = np.asarray(sh.g_valid)
            assert np.array_equal(va, vb)
            assert np.array_equal(a[va], b[vb]), f
        else:
            assert np.array_equal(a, b), f
