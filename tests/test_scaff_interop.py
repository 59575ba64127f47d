"""Map->scaff file contract + transcript-set parity vs the reference
binary (VERDICT r2 items 4 and 5).

The scaffold stage is resumable from map outputs alone
(.peGrads/.readOnContig/.ctg2Read + the contig stage's files), in both
directions:

* reference pregraph+contig+map files -> our scaff reproduces the
  reference scaff's .scafSeq byte-for-byte (set-wise);
* our pregraph+contig+map files -> reference scaff runs and matches
  our own scaff byte-for-byte (set-wise);
* full 4-stage runs match under junction normalization: each
  implementation's unitig orientation choice is arbitrary (the
  reference's comes from hash iteration order, SURVEY.md §7.3), and
  the no-fill renderer trims cutHead=K AFTER each N gap
  (prlReadFillGap.c:265-270,637-656), so a twin-path rendering keeps
  a different K-base flank; deleting the K real bases before each
  N-run makes the two renderings of one structure identical.
"""

import os
import re
import subprocess

import numpy as np
import pytest

from soapdenovo_trans_tpu import cli
from soapdenovo_trans_tpu.io import fastx
from soapdenovo_trans_tpu.ops import bits

from tests.test_reference_parity import read_fasta_seqs, ref_binary  # noqa: F401

pytestmark = pytest.mark.slow

K = 23
CONTIG_FILES = (".updated.edge", ".Arc", ".contig", ".ContigIndex",
                ".preGraphBasic")
MAP_FILES = (".readOnContig", ".ctg2Read", ".peGrads")


def canon(s):
    return min(s, bits.revcomp_str(s))


def normalize_junctions(s, k=K):
    """Junction-normalized scaffold: drop the K real bases preceding
    every N-run, then revcomp-canonicalize (see module docstring)."""
    out = re.sub(r"[ACGT]{%d}(?=N)" % k, "", s)
    return canon(out)


def scaf_set(path, norm=canon):
    return {norm(s) for s in read_fasta_seqs(path)}


def make_pe_dataset(rng, tmpdir, t_len=200, rep_len=40, ins=180, rl=50):
    """Two transcripts sharing a repeat < read length: contig stage
    splits them, PE links must re-join the arms."""
    from tests.test_reference_parity import make_dataset  # noqa: F401
    from tests.test_e2e import unique_kmer_seq

    u = [unique_kmer_seq(rng, t_len, K) for _ in range(4)]
    rep = unique_kmer_seq(rng, rep_len, K)
    t1, t2 = u[0] + rep + u[1], u[2] + rep + u[3]
    pairs = []
    for t in (t1, t2):
        for _ in range(120):
            start = int(rng.integers(0, len(t) - ins + 1))
            frag = t[start:start + ins]
            pairs.append(frag[:rl])
            pairs.append(bits.revcomp_str(frag[-rl:]))
    singles = []
    for t in (t1, t2):
        singles += [t[i:i + 50] for i in range(0, len(t) - 50 + 1, 2)]
    p_fa = os.path.join(tmpdir, "pairs.fa")
    s_fa = os.path.join(tmpdir, "singles.fa")
    fastx.write_fasta(p_fa, [(f"p{i}", r) for i, r in enumerate(pairs)])
    fastx.write_fasta(s_fa, [(f"s{i}", r) for i, r in enumerate(singles)])
    cfg = os.path.join(tmpdir, "pe.config")
    with open(cfg, "w") as fh:
        fh.write("max_rd_len=50\n"
                 f"[LIB]\navg_ins={ins}\nasm_flags=3\nmap_len=32\n"
                 f"p={p_fa}\n"
                 "[LIB]\nasm_flags=1\n"
                 f"f={s_fa}\n")
    return (t1, t2), cfg


def run_reference(binary, cfg, out, stages=("pregraph", "contig",
                                            "map", "scaff")):
    argsets = {
        "pregraph": ["pregraph", "-s", cfg, "-K", str(K), "-p", "2",
                     "-o", out],
        "contig": ["contig", "-g", out],
        "map": ["map", "-s", cfg, "-g", out, "-p", "2"],
        "scaff": ["scaff", "-g", out, "-p", "2"],
    }
    for st in stages:
        subprocess.run([binary] + argsets[st], capture_output=True,
                       timeout=300, check=True)


def link_files(src, dst, suffixes):
    for suf in suffixes:
        if os.path.exists(src + suf):
            if os.path.exists(dst + suf):
                os.unlink(dst + suf)
            os.link(src + suf, dst + suf)


@pytest.fixture(scope="module")
def pe_workspace(rng, ref_binary, tmp_path_factory):
    """One shared dataset: reference 4-stage run + our 4-stage run."""
    d = str(tmp_path_factory.mktemp("interop"))
    transcripts, cfg = make_pe_dataset(
        np.random.default_rng(7), d)
    ref_out = os.path.join(d, "refasm")
    run_reference(ref_binary, cfg, ref_out)
    our_out = os.path.join(d, "ourasm")
    cli.main(["all", "-s", cfg, "-o", our_out, "-K", str(K)])
    return {"dir": d, "cfg": cfg, "ref": ref_out, "our": our_out,
            "transcripts": transcripts, "binary": ref_binary}


def test_scafseq_parity_full_run(pe_workspace):
    """BASELINE.md target: transcript-set parity of full 4-stage runs
    (junction-normalized — orientation choice is arbitrary)."""
    ref = scaf_set(pe_workspace["ref"] + ".scafSeq", normalize_junctions)
    our = scaf_set(pe_workspace["our"] + ".scafSeq", normalize_junctions)
    assert ref, "reference produced no scaffolds"
    assert ref == our, (
        f"ref lens {sorted(len(s) for s in ref)} vs "
        f"our lens {sorted(len(s) for s in our)}")
    # and the joined arms actually appear (guards against both sides
    # degenerating to singletons)
    t1, t2 = pe_workspace["transcripts"]
    joined = "".join(sorted(our))
    assert t1[40:100] in joined or bits.revcomp_str(t1[40:100]) in joined


def test_our_scaff_from_reference_map(pe_workspace):
    """Reference pregraph+contig+map files -> our scaff == the
    reference's own scaff, byte-for-byte (set-wise): same stored
    orientations, same seed rule, same no-fill rendering."""
    cross = os.path.join(pe_workspace["dir"], "crossA")
    link_files(pe_workspace["ref"], cross, CONTIG_FILES + MAP_FILES)
    cli.main(["scaff", "-g", cross])
    assert scaf_set(cross + ".scafSeq") == \
        scaf_set(pe_workspace["ref"] + ".scafSeq")


def test_our_scaf_gap_matches_reference(pe_workspace):
    """On reference inputs, our .scaf_gap is line-identical to the
    reference's (ids, K-exclusive coordinates, GAP route lines)."""
    cross = os.path.join(pe_workspace["dir"], "crossA")
    if not os.path.exists(cross + ".scaf_gap"):
        link_files(pe_workspace["ref"], cross, CONTIG_FILES + MAP_FILES)
        cli.main(["scaff", "-g", cross])

    def records(path):
        recs, cur = set(), []
        for line in open(path):
            line = " ".join(line.split())
            if line.startswith(">"):
                if cur:
                    recs.add("\n".join(cur))
                cur = [line.split(" ", 1)[1]]  # drop scaffold index
            elif line:
                cur.append(line)
        if cur:
            recs.add("\n".join(cur))
        return recs

    assert records(cross + ".scaf_gap") == \
        records(pe_workspace["ref"] + ".scaf_gap")


def test_reference_scaff_from_our_map(pe_workspace):
    """Our pregraph+contig+map files -> reference scaff runs clean and
    reproduces OUR scaff's sequence set byte-for-byte (set-wise)."""
    cross = os.path.join(pe_workspace["dir"], "crossB")
    link_files(pe_workspace["our"], cross, CONTIG_FILES + MAP_FILES)
    r = subprocess.run(
        [pe_workspace["binary"], "scaff", "-g", cross, "-p", "2"],
        capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    assert scaf_set(cross + ".scafSeq") == \
        scaf_set(pe_workspace["our"] + ".scafSeq")


def test_pe_grads_header_counts_real_reads(pe_workspace):
    """.peGrads 'grads&num' counts actual reads (no batch padding) and
    matches the reference's header on the same dataset."""
    def header(path):
        with open(path) as fh:
            line = fh.readline()
        assert line.startswith("grads&num:")
        return line.split(":")[1].split()

    ref = header(pe_workspace["ref"] + ".peGrads")
    our = header(pe_workspace["our"] + ".peGrads")
    assert ref == our  # grads count, n_reads, max read len

    def rows(path):
        with open(path) as fh:
            fh.readline()
            return [line.split() for line in fh if line.strip()]

    assert rows(pe_workspace["ref"] + ".peGrads") == \
        rows(pe_workspace["our"] + ".peGrads")


def test_multilib_two_insert_sizes(rng, tmp_path):
    """Two PE libraries with different insert sizes: map writes two
    grads; scaff pairs each read with its own grad's insert size
    (connectByPE_grad per-grad iteration, attachPEinfo.c:322)."""
    from tests.test_e2e import unique_kmer_seq

    rng = np.random.default_rng(21)
    u = [unique_kmer_seq(rng, 220, K) for _ in range(2)]
    rep = unique_kmer_seq(rng, 40, K)
    t1 = u[0] + rep + u[1]

    def pe(t, ins, rl, n):
        out = []
        for _ in range(n):
            start = int(rng.integers(0, len(t) - ins + 1))
            frag = t[start:start + ins]
            out.append(frag[:rl])
            out.append(bits.revcomp_str(frag[-rl:]))
        return out

    pairs_a = pe(t1, 150, 50, 100)
    pairs_b = pe(t1, 320, 50, 100)
    singles = [t1[i:i + 50] for i in range(0, len(t1) - 50 + 1, 2)]
    fa_a = os.path.join(str(tmp_path), "a.fa")
    fa_b = os.path.join(str(tmp_path), "b.fa")
    fa_s = os.path.join(str(tmp_path), "s.fa")
    fastx.write_fasta(fa_a, [(f"a{i}", r) for i, r in enumerate(pairs_a)])
    fastx.write_fasta(fa_b, [(f"b{i}", r) for i, r in enumerate(pairs_b)])
    fastx.write_fasta(fa_s, [(f"s{i}", r) for i, r in enumerate(singles)])
    cfg = os.path.join(str(tmp_path), "two.config")
    with open(cfg, "w") as fh:
        fh.write("max_rd_len=50\n"
                 f"[LIB]\navg_ins=150\nasm_flags=3\nmap_len=32\np={fa_a}\n"
                 f"[LIB]\navg_ins=320\nasm_flags=2\nmap_len=32\n"
                 f"pair_num_cut=4\np={fa_b}\n"
                 f"[LIB]\nasm_flags=1\nf={fa_s}\n")
    out = os.path.join(str(tmp_path), "asm")
    cli.main(["all", "-s", cfg, "-o", out, "-K", str(K)])

    # .peGrads: two grads in ascending insert order with cumulative
    # bounds and the configured pair_num_cut
    with open(out + ".peGrads") as fh:
        head = fh.readline().split(":")[1].split()
        rows = [line.split() for line in fh if line.strip()]
    assert head[0] == "2"
    assert [int(r[0]) for r in rows] == [150, 320]
    assert int(rows[0][1]) == 200  # lib A reads
    assert int(rows[1][1]) == 400
    assert int(rows[1][3]) == 4   # pair_num_cut passthrough

    # the repeat-split transcript is re-joined
    scafs = [s for s in read_fasta_seqs(out + ".scafSeq")]
    def joined(a, b):
        for s in scafs:
            for cand in (s, bits.revcomp_str(s)):
                ia, ib = cand.find(a[40:120]), cand.find(b[40:120])
                if 0 <= ia < ib:
                    return True
        return False
    assert joined(u[0], u[1]), sorted(len(s) for s in scafs)


def test_scafseq_parity_with_errors(rng, ref_binary, tmp_path):
    """Full 4-stage transcript parity with sequencing errors: tip
    clipping + weak-edge cleaning must converge both pipelines to the
    same junction-normalized scaffold set."""
    rng2 = np.random.default_rng(55)
    (t1, t2), _ = make_pe_dataset(rng2, str(tmp_path))  # clean layout
    from tests.test_e2e import simulate_reads

    # regenerate the single-end coverage WITH errors on top of the
    # clean PE links
    singles = []
    for t in (t1, t2):
        singles += simulate_reads(rng2, t, 50, 40, error_rate=0.002)
    s_fa = os.path.join(str(tmp_path), "singles.fa")
    fastx.write_fasta(s_fa, [(f"e{i}", r)
                             for i, r in enumerate(singles)])
    cfg = os.path.join(str(tmp_path), "pe.config")
    text = open(cfg).read()
    with open(cfg, "w") as fh:  # swap in the error-bearing singles
        fh.write(text.rsplit("[LIB]", 1)[0] +
                 f"[LIB]\nasm_flags=1\nf={s_fa}\n")

    ref_out = os.path.join(str(tmp_path), "referr")
    run_reference(ref_binary, cfg, ref_out)
    our_out = os.path.join(str(tmp_path), "ourerr")
    cli.main(["all", "-s", cfg, "-o", our_out, "-K", str(K)])

    ref = scaf_set(ref_out + ".scafSeq", normalize_junctions)
    our = scaf_set(our_out + ".scafSeq", normalize_junctions)
    # long records (the real transcripts) must agree exactly
    ref_long = {s for s in ref if len(s) >= 300}
    our_long = {s for s in our if len(s) >= 300}
    assert ref_long, "reference produced no long scaffolds"
    assert ref_long == our_long, (
        sorted(len(s) for s in ref_long),
        sorted(len(s) for s in our_long))


def test_reference_scaff_F_consumes_our_read_in_gap(pe_workspace):
    """Our `map -f` binary .readInGap (output1read record format:
    int32 len/ctg/pos + tightString bytes, prlRead2Ctg.c:422-446)
    feeds the reference's `scaff -F` gap filler (loadReads4gap,
    prlReadFillGap.c:158-197) without error, and the joined
    transcripts still come out."""
    d = pe_workspace["dir"]
    cfg = pe_workspace["cfg"]
    cross = os.path.join(d, "crossF")
    link_files(pe_workspace["our"], cross, CONTIG_FILES)
    # rerun OUR map with -f to produce the gap payloads
    cli.main(["map", "-s", cfg, "-g", cross, "-f"])
    assert os.path.getsize(cross + ".readInGap") > 0
    r = subprocess.run(
        [pe_workspace["binary"], "scaff", "-g", cross, "-F", "-p", "2"],
        capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    out = r.stdout.decode()
    assert "Loaded" in out and ".readInGap" in out, out[-800:]
    seqs = read_fasta_seqs(cross + ".scafSeq")
    t1, t2 = pe_workspace["transcripts"]

    def joined(a, b):
        for s in seqs:
            for cand in (s, bits.revcomp_str(s)):
                ia, ib = cand.find(a[40:120]), cand.find(b[40:120])
                if 0 <= ia < ib:
                    return True
        return False

    assert joined(t1[:200], t1[-200:])
    assert joined(t2[:200], t2[-200:])


def _ensure_crossA(pe_workspace):
    cross = os.path.join(pe_workspace["dir"], "crossA")
    if not os.path.exists(cross + ".scafSeq"):
        link_files(pe_workspace["ref"], cross, CONTIG_FILES + MAP_FILES)
        cli.main(["scaff", "-g", cross])
    return cross


def _twin_of_ids(prefix):
    """1-based contig id -> 1-based twin id, from the contig files."""
    from soapdenovo_trans_tpu.io import graph_files
    ctg, _table, _k = graph_files.load_contig_graph_files(prefix)
    twin = np.asarray(ctg.twin[: int(ctg.n)])
    return lambda c: int(twin[c - 1]) + 1


def test_links_matches_reference(pe_workspace):
    """.links rows equal the reference's on the same map inputs
    (outputLinks, orderContig.c:3954-3986).  The reference prints each
    symmetric pair once, picking the twin reached first in its
    iteration order — normalize each row to the canonical twin pair."""
    cross = _ensure_crossA(pe_workspace)
    twin = _twin_of_ids(pe_workspace["ref"])

    def rows(path):
        out = set()
        for line in open(path):
            c1, c2, gap, wt, ins = line.split()
            a = (int(c1), int(c2))
            b = (twin(int(c2)), twin(int(c1)))
            out.add((min(a, b), int(gap), int(wt), int(ins)))
        return out

    ref = rows(pe_workspace["ref"] + ".links")
    our = rows(cross + ".links")
    assert ref, "reference wrote no links"
    assert ref == our


def test_scaf_statistics_matches_reference(pe_workspace):
    """.scafStatistics line-identical to the reference's on the same
    map inputs (ScafStat, orderContig.c:2421): identical scaffold
    sets must yield identical A/C/G/T counts, N50/N90 ladders and
    singleton sections."""
    cross = _ensure_crossA(pe_workspace)

    def lines(path):
        # the header embeds the run's file path — normalize it
        return [re.sub(r"'[^']*'", "'*'", " ".join(l.split()))
                for l in open(path)]

    ref = lines(pe_workspace["ref"] + ".scafStatistics")
    our = lines(cross + ".scafStatistics")
    assert ref == our


def test_read_on_scaf_matches_reference(pe_workspace):
    """.readOnScaf equal to the reference's when both scaffs consume
    the same map -r outputs (getReadOnScaf, ReadTrace.c:41-160):
    per-scaffold row sets and singleton sections match."""
    d = pe_workspace["dir"]
    cfg = pe_workspace["cfg"]
    # reference map -r (adds .readInformation), then both scaffs -r
    ref_r = os.path.join(d, "refr")
    link_files(pe_workspace["ref"], ref_r, CONTIG_FILES)
    run_reference(pe_workspace["binary"], cfg, ref_r, stages=("map",))
    subprocess.run(
        [pe_workspace["binary"], "map", "-s", cfg, "-g", ref_r,
         "-p", "2", "-r"], capture_output=True, timeout=300, check=True)
    subprocess.run(
        [pe_workspace["binary"], "scaff", "-g", ref_r, "-p", "2",
         "-r"], capture_output=True, timeout=300, check=True)

    our_r = os.path.join(d, "ourr")
    link_files(ref_r, our_r, CONTIG_FILES + MAP_FILES
               + (".readInformation",))
    cli.main(["scaff", "-g", our_r, "-r"])

    def sections(path):
        secs, head, cur = {}, None, set()
        for line in open(path):
            if line.startswith(">"):
                if head is not None:
                    secs[head] = cur
                head, cur = " ".join(line.split()), set()
            elif line.strip():
                cur.add(" ".join(line.split()))
        if head is not None:
            secs[head] = cur
        return secs

    ref = sections(ref_r + ".readOnScaf")
    our = sections(our_r + ".readOnScaf")
    assert ref, "reference wrote no readOnScaf"
    assert ref == our
