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
