"""End-to-end pipeline tests through the CLI surface: simulate
RNA-seq reads from known transcripts, run `pregraph` + `contig`,
assert transcript recovery from the .contig FASTA."""

import os
import subprocess

import numpy as np
import pytest

from soapdenovo_trans_tpu.ops import bits
from soapdenovo_trans_tpu.io import fastx
from soapdenovo_trans_tpu import cli

pytestmark = pytest.mark.slow


def unique_kmer_seq(rng, n, k):
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


def simulate_reads(rng, transcript, read_len=50, coverage=20,
                   error_rate=0.0):
    n_reads = int(len(transcript) * coverage / read_len)
    # guarantee terminal kmers are sampled, error-free (the assembler
    # can only build what the reads contain)
    reads = [transcript[:read_len] for _ in range(3)] + \
            [transcript[-read_len:] for _ in range(3)]
    for _ in range(n_reads):
        start = int(rng.integers(0, len(transcript) - read_len + 1))
        r = transcript[start : start + read_len]
        if error_rate > 0:
            chars = list(r)
            for i in range(len(chars)):
                if rng.random() < error_rate:
                    chars[i] = "ACGT"[int(rng.integers(4))]
            r = "".join(chars)
        if rng.random() < 0.5:
            r = bits.revcomp_str(r)
        reads.append(r)
    return reads


def write_inputs(tmpdir, reads, read_len):
    fa = os.path.join(tmpdir, "reads.fa")
    fastx.write_fasta(fa, [(f"read{i}", r) for i, r in enumerate(reads)])
    cfg = os.path.join(tmpdir, "reads.config")
    with open(cfg, "w") as fh:
        fh.write(f"max_rd_len={read_len}\n[LIB]\nasm_flags=3\nf={fa}\n")
    return cfg


def read_contig_fasta(path):
    seqs, cur = [], []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                    cur = []
            elif line:
                cur.append(line)
    if cur:
        seqs.append("".join(cur))
    return seqs


def canon(s):
    return min(s, bits.revcomp_str(s))


def run_pipeline(tmpdir, cfg, k=21):
    out = os.path.join(tmpdir, "asm")
    cli.main(["all", "-s", cfg, "-o", out, "-K", str(k)])
    return read_contig_fasta(out + ".contig")


def test_single_transcript_error_free(rng, tmp_path):
    t = unique_kmer_seq(rng, 400, 21)
    reads = simulate_reads(rng, t, read_len=50, coverage=25)
    cfg = write_inputs(str(tmp_path), reads, 50)
    contigs = run_pipeline(str(tmp_path), cfg)
    assert canon(t) in {canon(c) for c in contigs}


def test_single_transcript_with_errors(rng, tmp_path):
    t = unique_kmer_seq(rng, 400, 21)
    reads = simulate_reads(rng, t, read_len=50, coverage=40,
                           error_rate=0.005)
    cfg = write_inputs(str(tmp_path), reads, 50)
    contigs = run_pipeline(str(tmp_path), cfg)
    # error kmers must be cleaned away; the true transcript contig
    # must survive intact
    cc = {canon(c) for c in contigs}
    assert canon(t) in cc, f"lengths found: {[len(c) for c in contigs]}"


def test_two_isoforms_shared_exon(rng, tmp_path):
    # two transcripts sharing a middle exon; assembler should produce
    # contigs covering all three segments
    e1 = unique_kmer_seq(rng, 150, 21)
    shared = unique_kmer_seq(rng, 120, 21)
    e3 = unique_kmer_seq(rng, 150, 21)
    t1 = e1 + shared
    t2 = shared + e3
    reads = (simulate_reads(rng, t1, 50, 20) +
             simulate_reads(rng, t2, 50, 20))
    cfg = write_inputs(str(tmp_path), reads, 50)
    contigs = run_pipeline(str(tmp_path), cfg)
    joined = "#".join(canon(c) for c in contigs)
    # every true segment must be findable in some contig
    for seg in (e1[: 150 - 21], shared, e3[21:]):
        found = any(seg in c or bits.revcomp_str(seg) in c
                    for c in contigs)
        assert found, (len(seg), [len(c) for c in contigs])


def test_full_pipeline_pe_scaffolding(rng, tmp_path):
    """CLI `all` with a paired-end library: repeat-split transcripts
    must come back joined in .scafSeq."""
    u1 = unique_kmer_seq(rng, 150, 21)
    u2 = unique_kmer_seq(rng, 150, 21)
    u3 = unique_kmer_seq(rng, 150, 21)
    u4 = unique_kmer_seq(rng, 150, 21)
    rep = unique_kmer_seq(rng, 45, 21)
    t1, t2 = u1 + rep + u2, u3 + rep + u4
    ins, rl = 140, 45
    pairs = []
    for t in (t1, t2):
        for _ in range(60):
            start = int(rng.integers(0, len(t) - ins + 1))
            frag = t[start : start + ins]
            pairs.append(frag[:rl])
            pairs.append(bits.revcomp_str(frag[-rl:]))
    singles = []
    for t in (t1, t2):
        singles += [t[i : i + 50] for i in range(0, len(t) - 50 + 1, 4)]
        singles += [t[:50]] * 2 + [t[-50:]] * 2

    p_fa = os.path.join(str(tmp_path), "pairs.fa")
    s_fa = os.path.join(str(tmp_path), "singles.fa")
    fastx.write_fasta(p_fa, [(f"p{i}", r) for i, r in enumerate(pairs)])
    fastx.write_fasta(s_fa, [(f"s{i}", r) for i, r in enumerate(singles)])
    cfg = os.path.join(str(tmp_path), "pe.config")
    with open(cfg, "w") as fh:
        fh.write("max_rd_len=50\n"
                 "[LIB]\navg_ins=140\nasm_flags=3\nmap_len=32\n"
                 f"p={p_fa}\n"
                 "[LIB]\nasm_flags=1\n"
                 f"f={s_fa}\n")
    out = os.path.join(str(tmp_path), "asm")
    cli.main(["all", "-s", cfg, "-o", out, "-K", "21"])
    scafs = read_contig_fasta(out + ".scafSeq")
    assert scafs, "no scaffold output"

    def joined(a, b):
        for s in scafs:
            for cand in (s, bits.revcomp_str(s)):
                ia, ib = cand.find(a[40:100]), cand.find(b[40:100])
                if 0 <= ia < ib:
                    return True
        return False

    assert joined(u1, u2)
    assert joined(u3, u4)
    # NOTE: a scaffold joining arms of different transcripts (e.g.
    # u1..u4) may legitimately appear: deleteUnlikeArc drops the weak
    # junction arcs around the 2x-coverage repeat, the repeat merges
    # into one arm's contig, and PE pairs anchored in the absorbed
    # repeat then geometrically support the cross-join — the reference
    # pipeline behaves identically (its COMPLEX loci emit all paths,
    # transcriptome.c:1742) and treats such paths as isoform
    # hypotheses.  The repeat-free no-chimera property is asserted in
    # test_scaff.py where the repeat stays an isolated contig.


def test_rpkm_output(rng, tmp_path):
    """-R produces .readOnScaf and .RPKM.Stat with sane proportions."""
    t_long = unique_kmer_seq(rng, 500, 21)
    t_short = unique_kmer_seq(rng, 250, 21)
    reads = (simulate_reads(rng, t_long, 50, 30) +
             simulate_reads(rng, t_short, 50, 30))
    cfg = write_inputs(str(tmp_path), reads, 50)
    out = os.path.join(str(tmp_path), "asm")
    cli.main(["all", "-s", cfg, "-o", out, "-K", "21", "-R"])
    assert os.path.exists(out + ".RPKM.Stat")
    rows = []
    for line in open(out + ".RPKM.Stat"):
        if line.startswith(("#", "Transcript_ID")):
            continue
        name, ln, hits, rpkm = line.split("\t")
        rows.append((name, int(ln), int(hits), float(rpkm)))
    assert rows, "empty RPKM table"
    # both transcripts present with nonzero hit counts, and similar
    # RPKM (equal molar coverage by construction)
    withhits = [r for r in rows if r[2] > 0]
    assert len(withhits) >= 2
    assert os.path.exists(out + ".readOnScaf")
    assert sum(1 for _ in open(out + ".readOnScaf")) > 0


def test_gap_fill_and_stage_files(rng, tmp_path):
    """-F local gap assembly through the CLI: a coverage hole in the
    contig-building library is reconstructed exactly from the
    mapping-only PE library (reference localAsm/prlReadFillGap).
    Also exercises -f gap-read export, .peGrads/.ctg2Read/.links
    stage files, and -S structure resume."""
    t1 = "".join(rng.choice(list("ACGT"), size=700))
    hole = (330, 370)
    ins, rl = 200, 50
    cov = [t1[i : i + rl] for i in range(0, len(t1) - rl + 1, 2)
           if i + rl <= hole[0] or i >= hole[1]]
    pe = []
    for i in range(0, len(t1) - ins, 4):
        frag = t1[i : i + ins]
        pe.append(frag[:rl])
        pe.append(bits.revcomp_str(frag[-rl:]))
    c_fa = os.path.join(str(tmp_path), "cov.fa")
    p_fa = os.path.join(str(tmp_path), "pe.fa")
    fastx.write_fasta(c_fa, [(f"c{i}", r) for i, r in enumerate(cov)])
    fastx.write_fasta(p_fa, [(f"p{i}", r) for i, r in enumerate(pe)])
    cfg = os.path.join(str(tmp_path), "lib.config")
    with open(cfg, "w") as fh:
        fh.write("max_rd_len=50\n"
                 f"[LIB]\navg_ins=0\nasm_flags=1\nf={c_fa}\n"
                 f"[LIB]\navg_ins=200\nasm_flags=2\np={p_fa}\n")
    out = os.path.join(str(tmp_path), "asm")
    cli.main(["all", "-s", cfg, "-o", out, "-K", "23", "-F", "-f",
              "-L", "100"])
    # the scaffold must reconstruct t1 (no Ns) across the hole
    scafs = read_contig_fasta(out + ".scafSeq")
    core = t1[5:-5]
    assert any(core in s or core in bits.revcomp_str(s)
               for s in scafs), [len(s) for s in scafs]
    # filled gap recorded
    gap_lines = open(out + ".gapSeq").read()
    assert "localasm" in gap_lines or "overlap" in gap_lines
    # stage-file surface
    assert open(out + ".peGrads").readline().startswith("grads&num:")
    assert os.path.getsize(out + ".ctg2Read") > 0
    assert os.path.exists(out + ".links")
    assert os.path.exists(out + ".readInGap")
    assert os.path.exists(out + ".shortreadInGap.gz")
    assert os.path.exists(out + ".PEreadOnContig.gz")
    # -S resume: rebuild sequences from the existing .scaf_gap
    scaf_before = open(out + ".scafSeq").read()
    cli.main(["scaff", "-g", out, "-s", cfg, "-F", "-L", "100", "-S"])
    scaf_after = open(out + ".scafSeq").read()
    assert scaf_after == scaf_before
