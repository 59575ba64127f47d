"""Oracle parity: run the actual SOAPdenovo-Trans reference binary on
the same reads and compare contig sequence sets (SURVEY.md §4: the
natural oracle is the reference itself; sequence-set equality,
order/ID-insensitive, revcomp-normalized)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from soapdenovo_trans_tpu.ops import bits
from soapdenovo_trans_tpu.io import fastx
from soapdenovo_trans_tpu import cli

pytestmark = pytest.mark.slow

REF_SRC = "/root/reference/src"
BUILD_DIR = "/tmp/ref_oracle_build"


@pytest.fixture(scope="session")
def ref_binary():
    binary = os.path.join("/tmp", "SOAPdenovo-Trans-31mer")
    if not os.path.exists(binary):
        if not os.path.isdir(REF_SRC):
            pytest.skip("reference source unavailable")
        shutil.copytree(REF_SRC, BUILD_DIR, dirs_exist_ok=True)
        r = subprocess.run(["make"], cwd=BUILD_DIR, capture_output=True,
                           timeout=600)
        if not os.path.exists(binary):
            pytest.skip(f"reference build failed: {r.stderr[-500:]}")
    return binary


def canon(s):
    return min(s, bits.revcomp_str(s))


def read_fasta_seqs(path):
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


def make_dataset(rng, tmpdir, n_transcripts=4, t_len=400,
                 read_len=50, step=3):
    from tests.test_e2e import unique_kmer_seq

    transcripts = [unique_kmer_seq(rng, t_len, 23)
                   for _ in range(n_transcripts)]
    reads = []
    for t in transcripts:
        for i in range(0, len(t) - read_len + 1, step):
            r = t[i : i + read_len]
            reads.append(bits.revcomp_str(r) if rng.random() < 0.5 else r)
    rng.shuffle(reads)
    fa = os.path.join(tmpdir, "reads.fa")
    fastx.write_fasta(fa, [(f"r{i}", r) for i, r in enumerate(reads)])
    cfg = os.path.join(tmpdir, "lib.config")
    with open(cfg, "w") as fh:
        fh.write(f"max_rd_len={read_len}\n[LIB]\nasm_flags=3\nf={fa}\n")
    return transcripts, cfg


def test_contig_set_parity(rng, ref_binary, tmp_path):
    transcripts, cfg = make_dataset(rng, str(tmp_path))
    ref_out = os.path.join(str(tmp_path), "refasm")
    subprocess.run(
        [ref_binary, "pregraph", "-s", cfg, "-K", "23", "-p", "2",
         "-o", ref_out], capture_output=True, timeout=300, check=True)
    subprocess.run(
        [ref_binary, "contig", "-g", ref_out], capture_output=True,
        timeout=300, check=True)
    ref_contigs = {canon(s) for s in read_fasta_seqs(ref_out + ".contig")
                   if len(s) >= 100}

    our_out = os.path.join(str(tmp_path), "ourasm")
    cli.main(["all", "-s", cfg, "-o", our_out, "-K", "23"])
    our_contigs = {canon(s) for s in read_fasta_seqs(our_out + ".contig")
                   if len(s) >= 100}

    assert ref_contigs, "reference produced no contigs"
    missing = ref_contigs - our_contigs
    extra = our_contigs - ref_contigs
    assert not missing and not extra, (
        f"missing {[len(s) for s in missing]} "
        f"extra {[len(s) for s in extra]} "
        f"(ref {len(ref_contigs)}, ours {len(our_contigs)})")


def test_contig_set_parity_with_errors(rng, ref_binary, tmp_path):
    """With sequencing errors both pipelines must clean to the same
    long-contig set."""
    from tests.test_e2e import simulate_reads, unique_kmer_seq

    transcripts = [unique_kmer_seq(rng, 400, 23) for _ in range(3)]
    reads = []
    for t in transcripts:
        reads += simulate_reads(rng, t, 50, 40, error_rate=0.003)
    fa = os.path.join(str(tmp_path), "reads.fa")
    fastx.write_fasta(fa, [(f"r{i}", r) for i, r in enumerate(reads)])
    cfg = os.path.join(str(tmp_path), "lib.config")
    with open(cfg, "w") as fh:
        fh.write(f"max_rd_len=50\n[LIB]\nasm_flags=3\nf={fa}\n")

    ref_out = os.path.join(str(tmp_path), "refasm")
    subprocess.run(
        [ref_binary, "pregraph", "-s", cfg, "-K", "23", "-p", "2",
         "-o", ref_out], capture_output=True, timeout=300, check=True)
    subprocess.run(
        [ref_binary, "contig", "-g", ref_out], capture_output=True,
        timeout=300, check=True)
    ref_contigs = {canon(s) for s in read_fasta_seqs(ref_out + ".contig")
                   if len(s) >= 150}

    our_out = os.path.join(str(tmp_path), "ourasm")
    cli.main(["all", "-s", cfg, "-o", our_out, "-K", "23"])
    our_contigs = {canon(s) for s in read_fasta_seqs(our_out + ".contig")
                   if len(s) >= 150}

    # long contigs (the transcripts themselves) must agree exactly
    assert ref_contigs == our_contigs, (
        f"ref {sorted(len(s) for s in ref_contigs)} vs "
        f"ours {sorted(len(s) for s in our_contigs)}")


def test_bubble_merge_contiguity_vs_reference(rng, ref_binary, tmp_path):
    """SNP-bubble graphs: documented deviation from the reference.

    The reference's serial Tour-Bus (bubble.c:2048-2135) splits node
    descriptors at merge boundaries (splitNodeDescriptor, :1152) and,
    depending on hash-iteration order, leaves an arbitrary subset of
    merged bubbles fragmented at the SNP position (observed here:
    identical 400bp isoform pairs yield a mix of full-length contigs
    and ~200bp halves from the same run).  Our wave-parallel pass
    (graph/tourbus.py) merges every accepted bubble the same way, so
    all isoform pairs assemble full length.

    Pinned properties instead of set parity:
    * ours assembles every transcript full-length (one contig per
      isoform pair covering the base transcript);
    * every reference contig survives in ours: each is a substring of
      one of our contigs (we never LOSE sequence the reference kept).
    """
    from tests.test_e2e import unique_kmer_seq

    rng2 = np.random.default_rng(7)
    transcripts = []
    reads = []
    for _t in range(3):
        base = unique_kmer_seq(rng2, 400, 23)
        alt = list(base)
        alt[200] = "ACGT"[("ACGT".index(alt[200]) + 1) % 4]
        alt = "".join(alt)
        transcripts.append(base)
        for seq, step in ((base, 2), (alt, 6)):
            for i in range(0, len(seq) - 50 + 1, step):
                r = seq[i:i + 50]
                reads.append(bits.revcomp_str(r)
                             if rng2.random() < .5 else r)
    fa = os.path.join(str(tmp_path), "reads.fa")
    fastx.write_fasta(fa, [(f"r{i}", r) for i, r in enumerate(reads)])
    cfg = os.path.join(str(tmp_path), "lib.config")
    with open(cfg, "w") as fh:
        fh.write(f"max_rd_len=50\n[LIB]\nasm_flags=3\nf={fa}\n")

    ref_out = os.path.join(str(tmp_path), "refasm")
    subprocess.run(
        [ref_binary, "pregraph", "-s", cfg, "-K", "23", "-p", "2",
         "-o", ref_out], capture_output=True, timeout=300, check=True)
    subprocess.run(
        [ref_binary, "contig", "-g", ref_out, "-M", "1"],
        capture_output=True, timeout=300, check=True)
    ref_contigs = [s for s in read_fasta_seqs(ref_out + ".contig")
                   if len(s) >= 100]

    our_out = os.path.join(str(tmp_path), "ourasm")
    cli.main(["pregraph", "-s", cfg, "-o", our_out, "-K", "23"])
    cli.main(["contig", "-g", our_out, "-M", "1"])
    our_contigs = [s for s in read_fasta_seqs(our_out + ".contig")
                   if len(s) >= 100]

    # ours: every isoform pair assembles full length (one merged
    # contig spanning the base transcript minus 1x-covered tips)
    for t in transcripts:
        assert any(c in t or bits.revcomp_str(c) in t
                   for c in our_contigs if len(c) >= 350), \
            sorted(len(c) for c in our_contigs)
    # containment: nothing the reference kept is lost here
    for rc in ref_contigs:
        rcc = (rc, bits.revcomp_str(rc))
        assert any(v in oc for oc in our_contigs for v in rcc), len(rc)


def test_contig_parity_at_k31(rng, ref_binary, tmp_path):
    """K=31 — the 31mer binary's maximum K (one uint64 kmer in the
    reference, 2-lane packing here): contig sequence-set parity."""
    from tests.test_e2e import unique_kmer_seq

    rng2 = np.random.default_rng(31)
    transcripts = [unique_kmer_seq(rng2, 350, 31) for _ in range(3)]
    reads = []
    for t in transcripts:
        for i in range(0, len(t) - 60 + 1, 3):
            r = t[i : i + 60]
            reads.append(bits.revcomp_str(r) if rng2.random() < 0.5
                         else r)
    rng2.shuffle(reads)
    fa = os.path.join(str(tmp_path), "reads.fa")
    fastx.write_fasta(fa, [(f"r{i}", r) for i, r in enumerate(reads)])
    cfg = os.path.join(str(tmp_path), "lib.config")
    with open(cfg, "w") as fh:
        fh.write(f"max_rd_len=60\n[LIB]\nasm_flags=3\nf={fa}\n")

    ref_out = os.path.join(str(tmp_path), "refasm")
    subprocess.run(
        [ref_binary, "pregraph", "-s", cfg, "-K", "31", "-p", "2",
         "-o", ref_out], capture_output=True, timeout=300, check=True)
    subprocess.run(
        [ref_binary, "contig", "-g", ref_out], capture_output=True,
        timeout=300, check=True)
    ref_contigs = {canon(s) for s in read_fasta_seqs(ref_out + ".contig")
                   if len(s) >= 100}
    assert ref_contigs

    our_out = os.path.join(str(tmp_path), "ourasm")
    cli.main(["all", "-s", cfg, "-o", our_out, "-K", "31"])
    our_contigs = {canon(s) for s in read_fasta_seqs(our_out + ".contig")
                   if len(s) >= 100}
    assert ref_contigs == our_contigs, (
        sorted(len(s) for s in ref_contigs),
        sorted(len(s) for s in our_contigs))


@pytest.fixture(scope="session")
def ref_binary_63():
    """The MER63 compile variant (src/Makefile:21-23): K up to 63 as
    2x u64 in the reference."""
    binary = os.path.join("/tmp", "SOAPdenovo-Trans-63mer")
    if not os.path.exists(binary):
        if not os.path.isdir(REF_SRC):
            pytest.skip("reference source unavailable")
        bd = "/tmp/ref_oracle_build63"
        shutil.copytree(REF_SRC, bd, dirs_exist_ok=True)
        r = subprocess.run(["make", "63mer=1"], cwd=bd,
                           capture_output=True, timeout=600)
        if not os.path.exists(binary):
            pytest.skip(f"reference 63mer build failed: {r.stderr[-500:]}")
    return binary


@pytest.fixture(scope="session")
def ref_binary_127():
    """The MER127 compile variant (src/Makefile:17-19): K up to 127 as
    4x u64 in the reference (inc/def.h:45-52)."""
    binary = os.path.join("/tmp", "SOAPdenovo-Trans-127mer")
    if not os.path.exists(binary):
        if not os.path.isdir(REF_SRC):
            pytest.skip("reference source unavailable")
        bd = "/tmp/ref_oracle_build127"
        shutil.copytree(REF_SRC, bd, dirs_exist_ok=True)
        r = subprocess.run(["make", "127mer=1"], cwd=bd,
                           capture_output=True, timeout=600)
        if not os.path.exists(binary):
            pytest.skip(
                f"reference 127mer build failed: {r.stderr[-500:]}")
    return binary


def _wide_k_parity(ref_bin, tmp_path, k, read_len, t_len, seed):
    """Shared oracle harness for the wide-K variants: same reads
    through the reference MER63/MER127 binary and through our single
    parameterized (..., W)-lane path; contig sequence-set equality."""
    from tests.test_e2e import unique_kmer_seq

    rng2 = np.random.default_rng(seed)
    transcripts = [unique_kmer_seq(rng2, t_len, min(k, 31))
                   for _ in range(3)]
    reads = []
    for t in transcripts:
        for i in range(0, len(t) - read_len + 1, 3):
            r = t[i : i + read_len]
            reads.append(bits.revcomp_str(r) if rng2.random() < 0.5
                         else r)
    rng2.shuffle(reads)
    fa = os.path.join(str(tmp_path), "reads.fa")
    fastx.write_fasta(fa, [(f"r{i}", r) for i, r in enumerate(reads)])
    cfg = os.path.join(str(tmp_path), "lib.config")
    with open(cfg, "w") as fh:
        fh.write(f"max_rd_len={read_len}\n[LIB]\nasm_flags=3\nf={fa}\n")

    ref_out = os.path.join(str(tmp_path), "refasm")
    subprocess.run(
        [ref_bin, "pregraph", "-s", cfg, "-K", str(k), "-p", "2",
         "-o", ref_out], capture_output=True, timeout=300, check=True)
    subprocess.run(
        [ref_bin, "contig", "-g", ref_out], capture_output=True,
        timeout=300, check=True)
    ref_contigs = {canon(s) for s in read_fasta_seqs(ref_out + ".contig")
                   if len(s) >= 100}
    assert ref_contigs

    our_out = os.path.join(str(tmp_path), "ourasm")
    cli.main(["all", "-s", cfg, "-o", our_out, "-K", str(k)])
    our_contigs = {canon(s) for s in read_fasta_seqs(our_out + ".contig")
                   if len(s) >= 100}
    assert ref_contigs == our_contigs, (
        sorted(len(s) for s in ref_contigs),
        sorted(len(s) for s in our_contigs))


def test_contig_parity_at_k63(ref_binary_127, tmp_path):
    """K=63 needs the reference's MER127 build (its MER63 caps at 63
    but uses 2x u64 with K=63 edge cases; the 127mer covers it as
    4x u64, inc/def.h:45-52).  Ours: the same W=4-lane uint32 path."""
    _wide_k_parity(ref_binary_127, tmp_path, k=63, read_len=90,
                   t_len=420, seed=63)


def test_contig_parity_at_k75(ref_binary_127, tmp_path):
    """K=75 — squarely in MER127 territory (5-lane uint32 here)."""
    _wide_k_parity(ref_binary_127, tmp_path, k=75, read_len=100,
                   t_len=450, seed=75)


def test_contig_parity_at_k41_multiword(ref_binary_63, tmp_path):
    """K=41 — beyond one u64: the reference needs its MER63 build
    (every kmer op #ifdef-triplicated, src/kmer.c throughout); here
    the SAME parameterized (..., W)-lane uint32 path covers all K
    13..127.  Oracle parity exercises the 3-lane packing end to end."""
    from tests.test_e2e import unique_kmer_seq

    rng2 = np.random.default_rng(41)
    transcripts = [unique_kmer_seq(rng2, 350, 31) for _ in range(3)]
    reads = []
    for t in transcripts:
        for i in range(0, len(t) - 60 + 1, 3):
            r = t[i : i + 60]
            reads.append(bits.revcomp_str(r) if rng2.random() < 0.5
                         else r)
    rng2.shuffle(reads)
    fa = os.path.join(str(tmp_path), "reads.fa")
    fastx.write_fasta(fa, [(f"r{i}", r) for i, r in enumerate(reads)])
    cfg = os.path.join(str(tmp_path), "lib.config")
    with open(cfg, "w") as fh:
        fh.write(f"max_rd_len=60\n[LIB]\nasm_flags=3\nf={fa}\n")

    ref_out = os.path.join(str(tmp_path), "refasm")
    subprocess.run(
        [ref_binary_63, "pregraph", "-s", cfg, "-K", "41", "-p", "2",
         "-o", ref_out], capture_output=True, timeout=300, check=True)
    subprocess.run(
        [ref_binary_63, "contig", "-g", ref_out], capture_output=True,
        timeout=300, check=True)
    ref_contigs = {canon(s) for s in read_fasta_seqs(ref_out + ".contig")
                   if len(s) >= 100}
    assert ref_contigs

    our_out = os.path.join(str(tmp_path), "ourasm")
    cli.main(["all", "-s", cfg, "-o", our_out, "-K", "41"])
    our_contigs = {canon(s) for s in read_fasta_seqs(our_out + ".contig")
                   if len(s) >= 100}
    assert ref_contigs == our_contigs, (
        sorted(len(s) for s in ref_contigs),
        sorted(len(s) for s in our_contigs))
