"""IO layer: config parsing, FASTA/FASTQ/BAM readers, batching."""

import gzip
import os
import struct

import numpy as np
import pytest

from soapdenovo_trans_tpu.io import bam, fastx, libconfig


def test_config_parse(tmp_path):
    cfg = tmp_path / "t.config"
    cfg.write_text(
        "#comment\nmax_rd_len=100\n"
        "[LIB]\navg_ins=500\nreverse_seq=1\nasm_flags=2\nmap_len=40\n"
        "q1=a_1.fq\nq2=a_2.fq\n"
        "[LIB]\navg_ins=200\nasm_flags=3\nf=s.fa\np=p.fa\n")
    c = libconfig.parse_config(str(cfg))
    assert c.max_rd_len == 100
    assert len(c.libs) == 2
    # sorted by avg_ins ascending (reference cmp_lib)
    assert c.libs[0].avg_ins == 200 and c.libs[1].avg_ins == 500
    assert c.libs[1].reverse_seq == 1 and c.libs[1].map_len == 40
    assert c.libs[0].p == ["p.fa"] and c.libs[0].f == ["s.fa"]
    assert c.libs[1].has_pairs


def test_fastq_gz_roundtrip(tmp_path):
    fq = tmp_path / "r.fq.gz"
    with gzip.open(fq, "wt") as fh:
        for i, s in enumerate(["ACGTACGT", "GGGTTTAA"]):
            fh.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")
    assert list(fastx.read_fastq(str(fq))) == ["ACGTACGT", "GGGTTTAA"]


def test_pair_interleave_and_reverse(tmp_path):
    f1 = tmp_path / "a_1.fa"
    f2 = tmp_path / "a_2.fa"
    fastx.write_fasta(str(f1), [("x", "ACGT"), ("y", "TTTT")])
    fastx.write_fasta(str(f2), [("x", "CCCC"), ("y", "GGGA")])
    cfg = tmp_path / "t.config"
    cfg.write_text(
        f"max_rd_len=10\n[LIB]\nreverse_seq=1\nasm_flags=3\n"
        f"f1={f1}\nf2={f2}\n")
    c = libconfig.parse_config(str(cfg))
    batches = list(fastx.config_read_batches(c, batch_size=8))
    assert len(batches) == 1
    codes, lens, li = batches[0]
    # interleaved pairs, each reverse-complemented (reverse_seq=1)
    from soapdenovo_trans_tpu.ops import bits

    got = [bits.decode_seq(codes[i][: lens[i]]) for i in range(4)]
    assert got == ["ACGT", "GGGG", "AAAA", "TCCC"]


def _write_fake_bam(path, records):
    """records: list of (seq, flag)."""
    payload = b"BAM\x01"
    payload += struct.pack("<i", 0)      # l_text
    payload += struct.pack("<i", 1)      # n_ref
    payload += struct.pack("<i", 4) + b"ref\x00" + struct.pack("<i", 1000)
    nt16 = {c: "=ACMGRSVTWYHKDBN".index(c) for c in "ACGTN"}
    for seq, flag in records:
        name = b"r\x00"
        seq4 = bytearray()
        for i in range(0, len(seq), 2):
            hi = nt16[seq[i]] << 4
            lo = nt16[seq[i + 1]] if i + 1 < len(seq) else 0
            seq4.append(hi | lo)
        rec = struct.pack("<iiBBHHHiiii", 0, 0, len(name), 0, 0, 0,
                          flag, len(seq), -1, -1, 0)
        rec += name + bytes(seq4) + b"\xff" * len(seq)  # qual
        payload += struct.pack("<i", len(rec)) + rec
    with gzip.open(path, "wb") as fh:
        fh.write(payload)


def test_bam_reader(tmp_path):
    p = str(tmp_path / "t.bam")
    _write_fake_bam(p, [
        ("ACGTACGTAA", 0),
        ("TTGGCCAATT", 0x10),   # reverse strand -> complemented back
        ("AAAACCCCGG", 0x200),  # QC fail -> dropped
        ("NNACGTACGT", 0x400),  # duplicate -> dropped
        ("ACGTNNGTAC", 0),
    ])
    got = list(bam.read_bam(p))
    assert got == [
        "ACGTACGTAA",
        "AATTGGCCAA",  # revcomp of TTGGCCAATT
        "ACGTNNGTAC",
    ]


def test_bam_in_config(tmp_path):
    p = str(tmp_path / "t.bam")
    _write_fake_bam(p, [("ACGTACGTACGTACGTACGT", 0)] * 3)
    cfg = tmp_path / "t.config"
    cfg.write_text(f"max_rd_len=30\n[LIB]\nasm_flags=3\nb={p}\n")
    c = libconfig.parse_config(str(cfg))
    batches = list(fastx.config_read_batches(c, batch_size=4))
    assert len(batches) == 1
    codes, lens, _li = batches[0]
    assert (np.asarray(lens) > 0).sum() == 3


def test_native_decoder_matches_python(tmp_path):
    from soapdenovo_trans_tpu.io import native
    from soapdenovo_trans_tpu.ops import bits

    if not native.available():
        pytest.skip("no g++/zlib toolchain")
    rng = np.random.default_rng(3)
    reads = ["".join(rng.choice(list("ACGTN"), size=int(rng.integers(5, 90))))
             for _ in range(37)]
    fa = str(tmp_path / "r.fa")
    fastx.write_fasta(fa, [(f"r{i}", s) for i, s in enumerate(reads)])
    fq = str(tmp_path / "r.fq.gz")
    with gzip.open(fq, "wt") as fh:
        for i, s in enumerate(reads):
            fh.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")

    for path in (fa, fq):
        got = []
        for codes, lengths in native.read_batches(path, 8, 100):
            for i in range(8):
                if lengths[i] > 0:
                    got.append(bits.decode_seq(codes[i][: lengths[i]]))
        assert got == reads, path
    # truncation at max_len, mirroring rd_len_cutoff
    for codes, lengths in native.read_batches(fa, 64, 20):
        for i, s in enumerate(reads):
            assert lengths[i] == min(len(s), 20)
        break


def test_native_bam_matches_python(tmp_path):
    """The C++ BAM path (csrc/fastx_decoder.cpp) must agree with the
    pure-Python reader on sequences, flag filtering
    (0x100/0x200/0x400/0x800 dropped — a deliberate, documented delta
    vs the reference's read1seqbam, whose default samtools filter
    drops nothing; see io/bam.py) and 0x10 reverse-complementation."""
    from soapdenovo_trans_tpu.io import native
    from soapdenovo_trans_tpu.ops import bits

    if not native.available():
        pytest.skip("no g++/zlib toolchain")
    p = str(tmp_path / "t.bam")
    rng = np.random.default_rng(9)
    records = []
    for i in range(37):
        seq = "".join("ACGTN"[j] for j in rng.integers(0, 5, 20 + i % 7))
        flag = [0, 0x10, 0x100, 0x200, 0x400, 0x800][i % 6]
        records.append((seq, flag))
    _write_fake_bam(p, records)

    want = list(bam.read_bam(p))
    assert want  # keeps 0 and 0x10 records only

    got = []
    for codes, lens in native.read_batches(p, 8, 40):
        for r in range(codes.shape[0]):
            if lens[r] > 0:
                got.append(bits.decode_seq(codes[r, : lens[r]]))
    assert got == want


def test_native_bam_through_config(tmp_path):
    """b= libraries stream through the native decoder when available
    and produce the same batches as the Python fallback."""
    from soapdenovo_trans_tpu.io import native

    if not native.available():
        pytest.skip("no g++/zlib toolchain")
    p = str(tmp_path / "t.bam")
    _write_fake_bam(p, [("ACGTACGTACGTACGTACGT", 0)] * 5 +
                       [("TTTTTTTTTTGGGGGGGGGG", 0x200)])
    cfg = tmp_path / "t.config"
    cfg.write_text(f"max_rd_len=30\n[LIB]\nasm_flags=3\nb={p}\n")
    c = libconfig.parse_config(str(cfg))
    batches = list(fastx.config_read_batches(c, batch_size=4))
    total = sum(int((np.asarray(l) > 0).sum()) for _, l, _ in batches)
    assert total == 5  # QC-fail record dropped
