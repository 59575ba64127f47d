"""Scaffold stage: PE/SE links -> loci -> transcripts
(reference transcriptome.c + attachPEinfo.c semantics)."""

import numpy as np
import pytest
import jax.numpy as jnp

from soapdenovo_trans_tpu.ops import bits, dictionary, kmer
from soapdenovo_trans_tpu.graph import dbg as dbg_mod
from soapdenovo_trans_tpu.graph import (arcs, connections, contig_merge,
                                        unitigs)
from soapdenovo_trans_tpu.stages import map as map_stage
from soapdenovo_trans_tpu.stages import scaff

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


def pad(reads):
    maxlen = max(len(s) for s in reads)
    padded = np.full((len(reads), maxlen), 4, np.uint8)
    lens = []
    for i, s in enumerate(reads):
        padded[i, : len(s)] = bits.encode_seq(s)
        lens.append(len(s))
    return jnp.asarray(padded), jnp.asarray(lens)


def assemble(reads, k=K):
    padded, lens = pad(reads)
    stream = kmer.chop_reads(padded, lens, k)
    table = dictionary.build(stream, k)
    graph = dbg_mod.build_dbg(table, k)
    eg = unitigs.condense(graph, table, k)
    patch = arcs.build_patch(eg, table, k)
    f, t, v = arcs.thread_reads(padded, lens, table, eg, patch, k)
    aset = arcs.count_arcs(f, t, v, eg.twin)
    ctg = contig_merge.concatenate(eg, aset)
    return table, ctg


def pe_reads(rng, transcript, ins, read_len, n_pairs):
    """FR pairs: read1 forward from fragment start, read2 = rc of
    fragment end; consecutive in the returned list."""
    out = []
    for _ in range(n_pairs):
        start = int(rng.integers(0, len(transcript) - ins + 1))
        frag = transcript[start : start + ins]
        out.append(frag[:read_len])
        out.append(bits.revcomp_str(frag[-read_len:]))
    return out


def build_scenario(rng):
    """Two transcripts sharing a 40bp repeat; unique arms 150bp."""
    u1 = unique_kmer_seq(rng, 150)
    u2 = unique_kmer_seq(rng, 150)
    u3 = unique_kmer_seq(rng, 150)
    u4 = unique_kmer_seq(rng, 150)
    rep = unique_kmer_seq(rng, 40)
    t1 = u1 + rep + u2
    t2 = u3 + rep + u4
    return t1, t2, (u1, u2, u3, u4, rep)


def test_pe_scaffolding(rng):
    t1, t2, parts = build_scenario(rng)
    ins, rl = 120, 40
    # coverage reads (singles) for assembly + PE pairs for linking
    cov = []
    for t in (t1, t2):
        cov += [t[i : i + 50] for i in range(0, len(t) - 50 + 1, 5)]
        cov += [t[:50], t[-50:]]
    pairs = pe_reads(rng, t1, ins, rl, 40) + pe_reads(rng, t2, ins, rl, 40)
    table, ctg = assemble(cov + pairs)
    n = int(ctg.n)
    assert n >= 10  # 5 unitig pairs (4 arms + repeat, arms extended)

    index = map_stage.build_contig_index(ctg, table, K)
    padded, lens = pad(pairs)
    pl = map_stage.map_reads(padded, lens, index, K, map_len=32)

    full_len = ctg.length + K
    f, t_, g, v = connections.pe_link_candidates(
        pl.ctg, pl.pos, ctg.twin, full_len, ins, K)
    is_se = jnp.zeros_like(v)
    conn = connections.aggregate(f, t_, g, is_se, v)
    assert int(conn.n) > 0

    sres = scaff.run_scaff(
        ctg, conn, K, table,
        scaff.ScaffParams(min_unique_len=100))
    recs, stats = sres.recs, sres.stats
    # each transcript's unique arms must be joined in one scaffold
    seqs = [s for h, s in recs if h.startswith("scaffold")]
    assert len(seqs) >= 2
    u1, u2, u3, u4, rep = parts

    def covers(seq, a, b):
        s = seq
        rc = bits.revcomp_str(seq)
        for cand in (s, rc):
            ia = cand.find(a[20:-20])
            ib = cand.find(b[20:-20])
            if ia >= 0 and ib >= 0 and ia < ib:
                return True
        return False

    assert any(covers(s, u1, u2) for s in seqs), \
        [len(s) for s in seqs]
    assert any(covers(s, u3, u4) for s in seqs)
    # and no chimeric scaffold joining arms of different transcripts
    assert not any(covers(s, u1, u4) for s in seqs)
    assert not any(covers(s, u3, u2) for s in seqs)
    # gap length should approximate the repeat span
    assert stats["count"] >= 2


def test_se_links_join_contigs(rng):
    t1, t2, parts = build_scenario(rng)
    # long single reads spanning the repeat provide SE links
    long_reads = []
    for t in (t1, t2):
        for i in range(110, 190, 4):
            long_reads.append(t[i - 60 : i + 60])
    cov = []
    for t in (t1, t2):
        cov += [t[i : i + 50] for i in range(0, len(t) - 50 + 1, 5)]
        cov += [t[:50], t[-50:]]
    table, ctg = assemble(cov + long_reads)
    index = map_stage.build_contig_index(ctg, table, K)
    padded, lens = pad(long_reads)
    pl = map_stage.map_reads(padded, lens, index, K, map_len=20)

    full_len = ctg.length + K
    n_ctg = int(ctg.n)
    unique = (np.arange(ctg.length.shape[0]) < n_ctg) & \
        (np.asarray(full_len) >= 100)
    r = padded.shape[0]
    p = padded.shape[1] - K + 1
    f, t_, g, v = connections.se_link_candidates(
        pl.g_ctg, pl.g_ctg_off, pl.g_read_off, pl.g_valid,
        r, p, K, twin=ctg.twin, ctg_len=full_len,
        unique=jnp.asarray(unique))
    conn = connections.aggregate(f, t_, g, jnp.ones_like(v), v)
    assert int(conn.n) > 0
    recs = scaff.run_scaff(ctg, conn, K, table).recs
    seqs = [s for h, s in recs if h.startswith("scaffold")]
    u1, u2, u3, u4, rep = parts
    joined = 0
    for a, b in ((u1, u2), (u3, u4)):
        for s in seqs:
            sa = s if s.find(a[20:40]) >= 0 else bits.revcomp_str(s)
            if sa.find(a[20:40]) >= 0 and sa.find(b[20:40]) > sa.find(a[20:40]) >= 0:
                joined += 1
                break
    assert joined == 2, [len(s) for s in seqs]


def _mini_conn_graph():
    """4 directed contigs (twin = self for simplicity): hub 0 is
    non-unique with links to unique 1,2,3 of weights 9,5,2."""
    twin = np.arange(8)
    ctg_len = np.full(8, 200)
    unique = np.array([False, True, True, True] + [True] * 4)

    class C:
        n = 3
        from_ctg = np.array([0, 0, 0])
        to_ctg = np.array([1, 2, 3])
        gap = np.zeros(3, np.int32)
        weight = np.array([9, 5, 2])
        se_count = np.zeros(3, np.int32)

    return scaff.ConnGraph(C(), twin, ctg_len, unique)


def test_delete_unlikely_keeps_top_k():
    """-c (deleteUnlikelyCnt, transcriptome.c:2202): non-unique contig
    with more than cut_off unique links keeps the heaviest cut_off."""
    g = _mini_conn_graph()
    scaff.delete_unlikely(g, 4, 2)
    live = sorted(t for t, r in g.out[0].items() if not r["deleted"])
    assert live == [1, 2]


def test_delete_unlikely_off_values():
    for off in (0, 11):
        g = _mini_conn_graph()
        scaff.delete_unlikely(g, 4, off)
        assert all(not r["deleted"] for r in g.out[0].values())


def test_scaf_statistics_report(tmp_path):
    """ScafStat report (orderContig.c:2421): <100bp records excluded,
    singleton counting, composition, N50 ladder, NG50."""
    from soapdenovo_trans_tpu.io import stagefiles

    prefix = str(tmp_path / "x")
    with open(prefix + ".scafSeq", "w") as fh:
        fh.write(">scaffold1 2 300 Locus_0_0 LINEAR\n" + "A" * 150 +
                 "N" * 10 + "G" * 140 + "\n")
        fh.write(">C7\n" + "C" * 120 + "\n")
        fh.write(">C9\n" + "T" * 50 + "\n")  # < 100bp: excluded
    with open(prefix + ".contig", "w") as fh:
        fh.write(">1 length 200 cvg_10.0_tip_0\n" + "ACGT" * 50 + "\n")
    stagefiles.write_scaf_statistics(prefix, known_genome_size=400)
    text = open(prefix + ".scafStatistics").read()
    assert "Size_includeN\t420" in text
    assert "Size_withoutN\t410" in text
    assert "Scaffold_Num\t2" in text
    assert "Singleton_Num\t1" in text
    assert "Known_genome_size\t400" in text
    assert "N50\t300\t1" in text
    assert "NG50\t300\t1" in text
    assert "Contig_Num\t1" in text
    assert "GC_Content\t50.00%" in text.split("Contig_Num")[1] or \
        "GC_Content\t50.00%" in text


def test_heaviest_paths_includes_row0():
    """Contig row 0 is a valid path head/member — -1 traceback sentinel
    (getBestWay, transcriptome.c:1599).  Path 0 -> 1 -> 2 must come back
    intact, not truncated at row 0."""
    twin = np.arange(6)
    ctg_len = np.full(6, 200)
    unique = np.ones(6, bool)

    class C:
        n = 2
        from_ctg = np.array([0, 1])
        to_ctg = np.array([1, 2])
        gap = np.zeros(2, np.int32)
        weight = np.array([5, 5])
        se_count = np.zeros(2, np.int32)

    g = scaff.ConnGraph(C(), twin, ctg_len, unique)
    cvg = np.array([10.0, 50.0, 10.0, 0, 0, 0])
    paths = scaff.heaviest_paths(g, [0, 1, 2], cvg, scaff.ScaffParams())
    assert [0, 1, 2] in paths


def test_build_structure_matches_dict_path(rng):
    """The vectorized structure phase (build_structure: COO masks +
    label-prop components + per-locus mini graphs) must produce the
    same transcript set as the legacy global-dict pipeline."""
    rng2 = np.random.default_rng(77)
    n_ctg = 400
    twin = np.arange(n_ctg, dtype=np.int64) ^ 1
    full_len = rng2.integers(80, 400, n_ctg // 2).repeat(2)
    unique = full_len >= 100
    # random sparse twin-symmetric connections
    n_conn = 300
    f = rng2.integers(0, n_ctg, n_conn)
    t = rng2.integers(0, n_ctg, n_conn)
    keep = (f != t) & (twin[f] != t)
    f, t = f[keep], t[keep]
    w = rng2.integers(1, 12, f.shape[0])
    g_ = rng2.integers(-30, 150, f.shape[0])
    fa = np.concatenate([f, twin[t]])
    ta = np.concatenate([t, twin[f]])
    ga = np.concatenate([g_, g_])
    wa = np.concatenate([w, w])

    class C:
        n = fa.shape[0]
        from_ctg = fa
        to_ctg = ta
        gap = ga
        weight = wa
        se_count = np.zeros(fa.shape[0], np.int64)

    params = scaff.ScaffParams(max_cnt=2)
    cvg = rng2.integers(1, 100, n_ctg)

    # legacy global-dict pipeline
    gd = scaff.ConnGraph(C(), twin, full_len, unique)
    scaff.delete_weak(gd, params.weak_cnt)
    loci = scaff.get_loci(gd, n_ctg)
    for locus in loci:
        scaff.linearize(gd, locus, params, K)
        scaff.delete_inconsistent(gd, locus)
        scaff.avoid_loops(gd, locus)
        scaff.linearize(gd, locus, params, K)
    scaff.delete_unlikely(gd, n_ctg, params.max_cnt)
    loci = scaff.get_loci(gd, n_ctg)
    legacy = scaff.build_transcripts(
        [(gd, locus) for locus in loci], cvg, params)

    fast = scaff.build_structure(C(), twin, full_len, unique, cvg,
                                 params, K)

    def key(trs):
        return sorted((tuple(tr.contigs), tr.kind, tuple(tr.gaps))
                      for tr in trs)

    assert key(fast) == key(legacy)


def test_unlikely_mask_matches_dict(rng):
    """_unlikely_mask == delete_unlikely on the hub fixture (top-k
    kept, twins die along)."""
    twin = np.arange(8, dtype=np.int64)
    unique = np.array([False, True, True, True] + [True] * 4)
    f = np.array([0, 0, 0], np.int64)
    t = np.array([1, 2, 3], np.int64)
    wt = np.array([9, 5, 2])
    alive = np.ones(3, bool)
    out = scaff._unlikely_mask(f, t, wt, alive, unique, twin, 8, 2)
    assert out.tolist() == [True, True, False]
    # off values keep everything
    for off in (0, 11):
        assert scaff._unlikely_mask(
            f, t, wt, alive, unique, twin, 8, off).all()
