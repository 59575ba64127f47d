"""Reference stage-file interop: cross-run the two implementations
across the pregraph/contig boundary and round-trip our own files.

SURVEY.md §4/§5: the file-per-stage design is the oracle comparison
point — reference-pregraph -> our-contig and our-pregraph ->
reference-contig must both reproduce the contig sequence set.
"""

import os
import subprocess

import numpy as np
import pytest

from soapdenovo_trans_tpu import cli
from soapdenovo_trans_tpu.io import graph_files
from soapdenovo_trans_tpu.ops import bits

from tests.test_reference_parity import (
    canon, make_dataset, read_fasta_seqs, ref_binary)  # noqa: F401

pytestmark = pytest.mark.slow


def contig_set(path, min_len=100):
    return {canon(s) for s in read_fasta_seqs(path) if len(s) >= min_len}


def test_pregraph_file_roundtrip(rng, tmp_path):
    """our pregraph files -> our contig == in-memory contig result."""
    transcripts, cfg = make_dataset(rng, str(tmp_path))
    out = os.path.join(str(tmp_path), "asm")
    cli.main(["all", "-s", cfg, "-o", out, "-K", "23"])
    mem_contigs = contig_set(out + ".contig")

    # resume contig from the written .vertex/.edge.gz/.preArc
    out2 = os.path.join(str(tmp_path), "asm2")
    for suffix in (".vertex", ".edge.gz", ".preArc", ".preGraphBasic"):
        os.link(out + suffix, out2 + suffix)
    cli.main(["contig", "-g", out2])
    assert contig_set(out2 + ".contig") == mem_contigs


def test_loader_parses_reference_pregraph(rng, ref_binary, tmp_path):
    """Our contig stage consumes the reference binary's pregraph
    files and reproduces the reference's contig set."""
    transcripts, cfg = make_dataset(rng, str(tmp_path))
    ref_out = os.path.join(str(tmp_path), "refasm")
    subprocess.run(
        [ref_binary, "pregraph", "-s", cfg, "-K", "23", "-p", "2",
         "-o", ref_out], capture_output=True, timeout=300, check=True)
    subprocess.run(
        [ref_binary, "contig", "-g", ref_out], capture_output=True,
        timeout=300, check=True)
    ref_contigs = contig_set(ref_out + ".contig")
    assert ref_contigs

    our_out = os.path.join(str(tmp_path), "ourasm")
    for suffix in (".vertex", ".edge.gz", ".preArc", ".preGraphBasic"):
        os.link(ref_out + suffix, our_out + suffix)
    cli.main(["contig", "-g", our_out])
    assert contig_set(our_out + ".contig") == ref_contigs


def test_reference_consumes_our_pregraph(rng, ref_binary, tmp_path):
    """The reference binary's contig stage runs on OUR
    .vertex/.edge.gz/.preArc and reproduces its own contig set."""
    transcripts, cfg = make_dataset(rng, str(tmp_path))
    ref_out = os.path.join(str(tmp_path), "refasm")
    subprocess.run(
        [ref_binary, "pregraph", "-s", cfg, "-K", "23", "-p", "2",
         "-o", ref_out], capture_output=True, timeout=300, check=True)
    subprocess.run(
        [ref_binary, "contig", "-g", ref_out], capture_output=True,
        timeout=300, check=True)
    ref_contigs = contig_set(ref_out + ".contig")

    our_out = os.path.join(str(tmp_path), "ourasm")
    cli.main(["pregraph", "-s", cfg, "-o", our_out, "-K", "23"])
    r = subprocess.run(
        [ref_binary, "contig", "-g", our_out], capture_output=True,
        timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    cross = contig_set(our_out + ".contig")
    assert cross == ref_contigs


def test_contig_graph_files_resume(rng, tmp_path):
    """map + scaff resumed from .updated.edge/.Arc/.contig reproduce
    the in-memory pipeline's scafSeq set, and .newContigIndex is
    emitted."""
    transcripts, cfg = make_dataset(rng, str(tmp_path))
    out = os.path.join(str(tmp_path), "asm")
    cli.main(["all", "-s", cfg, "-o", out, "-K", "23"])
    mem_scaf = contig_set(out + ".scafSeq", min_len=0)

    out2 = os.path.join(str(tmp_path), "asm2")
    for suffix in (".contig", ".ContigIndex", ".updated.edge", ".Arc",
                   ".preGraphBasic"):
        os.link(out + suffix, out2 + suffix)
    cli.main(["map", "-s", cfg, "-g", out2])
    cli.main(["scaff", "-g", out2])
    assert os.path.exists(out2 + ".newContigIndex")
    assert contig_set(out2 + ".scafSeq", min_len=0) == mem_scaf


def test_kmer_hex_roundtrip():
    rng = np.random.default_rng(3)
    for k in (13, 23, 31, 43, 63, 77, 127):
        w = bits.words_for_k(k)
        lanes = rng.integers(0, 2**32, size=(w,), dtype=np.uint32)
        lanes &= bits.mask_np(k)
        txt = graph_files._kmer_hex(lanes, k)
        back = graph_files._parse_kmer_hex(txt.split(), k)
        assert np.array_equal(lanes, back), (k, txt)


def test_reps_tie_path_and_mark_on_edge(rng, tmp_path):
    """pregraph -R writes .path (binary: u8 count + count u32 edge
    file ids per recorded read) and .markOnEdge (one saturating count
    per edge file id) — recordPathBin semantics
    (prlRead2path.c:507-573; the reference's own -R is commented out,
    pregraph.c:149-151, so this is a documented superset)."""
    import struct

    from soapdenovo_trans_tpu.io import fastx
    from tests.test_e2e import unique_kmer_seq

    # two isoforms sharing a 30bp exon: 60bp reads crossing both
    # junctions traverse arm -> exon -> arm (>= 3 edges), so paths
    # actually get recorded
    rng2 = np.random.default_rng(13)
    a, b, c, d = (unique_kmer_seq(rng2, 150, 23) for _ in range(4))
    exon = unique_kmer_seq(rng2, 30, 23)
    reads = []
    for t in (a + exon + b, c + exon + d):
        for i in range(0, len(t) - 60 + 1, 2):
            reads.append(t[i : i + 60])
    fa = os.path.join(str(tmp_path), "reads.fa")
    fastx.write_fasta(fa, [(f"r{i}", s) for i, s in enumerate(reads)])
    cfg = os.path.join(str(tmp_path), "lib.config")
    with open(cfg, "w") as fh:
        fh.write(f"max_rd_len=60\n[LIB]\nasm_flags=3\nf={fa}\n")
    out = os.path.join(str(tmp_path), "asm")
    cli.main(["pregraph", "-s", cfg, "-o", out, "-K", "23", "-R"])

    marks = [int(x) for x in open(out + ".markOnEdge")]
    assert marks, "no .markOnEdge rows"
    assert all(0 <= m <= 255 for m in marks)

    # parse the binary .path stream and recount markers
    tally = np.zeros(len(marks) + 1, np.int64)
    n_paths = 0
    with open(out + ".path", "rb") as fh:
        while True:
            b = fh.read(1)
            if not b:
                break
            (cnt,) = struct.unpack("<B", b)
            ids = np.frombuffer(fh.read(4 * cnt), "<u4")
            assert cnt >= 3
            assert (ids >= 1).all() and (ids <= len(marks)).all()
            np.add.at(tally, ids, 1)
            n_paths += 1
    assert n_paths > 0
    assert [min(int(t), 255) for t in tally[1:]] == marks


def test_loader_twin_sequences_are_revcomps(rng, tmp_path):
    """Every twin pair materialized by load_pregraph_files must decode
    to exact reverse complements (regression: the vectorized loader
    once sliced the twin's appended bases from the wrong end, which
    contig-set roundtrips on bubble-free data cannot catch)."""
    from soapdenovo_trans_tpu.graph import unitigs

    transcripts, cfg = make_dataset(rng, str(tmp_path))
    out = os.path.join(str(tmp_path), "asm")
    cli.main(["pregraph", "-s", cfg, "-o", out, "-K", "23"])
    table, edges, aset, k = graph_files.load_pregraph_files(out)
    seqs = unitigs.edge_sequences(edges, table, k)
    tw = np.asarray(edges.twin)
    assert int(edges.n_edges) > 0
    for e in range(int(edges.n_edges)):
        t = int(tw[e])
        assert seqs[t] == bits.revcomp_str(seqs[e]), e
