"""Stage-file writers (reference-compatible formats).

The reference communicates between stages through files
(README.md:149-211); we keep the arrays in memory but emit the same
files so users can resume per-stage, inspect intermediates, and diff
against the reference binary (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import gzip
from typing import List

import numpy as np

from ..ops import bits


def write_kmer_freq(path: str, histogram: np.ndarray) -> None:
    """.kmerFreq (reference freqStat, prlHashReads.c:994): one count
    per line for frequencies 1..255."""
    with open(path, "w") as fh:
        for i in range(1, len(histogram)):
            fh.write(f"{int(histogram[i])}\n")


def write_pregraph_basic(path: str, n_vertex: int, k: int, n_edge: int,
                         max_read_len: int, min_read_len: int = 0,
                         max_name_len: int = 256) -> None:
    """.preGraphBasic (reference output_vertex, output_pregraph.c:74)."""
    with open(path, "w") as fh:
        fh.write(f"VERTEX {n_vertex} K {k}\n")
        fh.write(f"\nEDGEs {n_edge}\n")
        fh.write(f"\nMaxReadLen {max_read_len} MinReadLen {min_read_len} "
                 f"MaxNameLen {max_name_len}\n")


def _wrap(seq: str, width: int = 100) -> str:
    return "\n".join(seq[i : i + width] for i in range(0, len(seq), width))


def write_contig_fasta(path: str, contigs, table, k: int,
                       arcs=None) -> List[int]:
    """.contig (reference output_contig, output_contig.c:120-240):
    contigs sorted by length ascending, ids assigned over the sorted
    order with twins sharing consecutive ids (only one of each twin
    pair printed), header '>id length L cvg_C.C_tip_T'.

    Returns the sorted-order permutation (new id - 1 -> contig row),
    the analogue of the reference's flag_array."""
    from ..graph import contig_merge

    n = int(contigs.n)
    lengths = np.asarray(contigs.length[:n]) + k
    twin = np.asarray(contigs.twin[:n])
    cvg = np.asarray(contigs.cvg[:n])
    seqs = contig_merge.contig_sequences(contigs, table, k)

    has_out = np.zeros(n, bool)
    if arcs is not None:
        a_n = int(arcs.n)
        f = np.asarray(arcs.from_ed[:a_n])
        has_out[f[(f >= 0) & (f < n)]] = True

    order = np.argsort(lengths, kind="stable")
    printed = np.zeros(n, bool)
    perm: List[int] = []
    with open(path, "w") as fh:
        cid = 0
        for row in order:
            if printed[row]:
                continue
            cid += 1
            perm.append(int(row))
            printed[row] = True
            if 0 <= twin[row] < n:
                printed[twin[row]] = True
            # a tip has arcs on at most one side (output_contig.c:232)
            tip = int(not (has_out[row] and
                           (0 <= twin[row] < n and has_out[twin[row]])))
            fh.write(f">{cid} length {lengths[row]} "
                     f"cvg_{cvg[row] / 10:.1f}_tip_{tip}\n")
            fh.write(_wrap(seqs[row]) + "\n")
            if 0 <= twin[row] < n and twin[row] != row:
                cid += 1  # twin consumes an id, like the reference
                perm.append(int(twin[row]))
    return perm


def write_contig_index(path: str, contigs, k: int, perm) -> None:
    """.ContigIndex (reference output_contig.c:262-277)."""
    n = int(contigs.n)
    lengths = np.asarray(contigs.length[:n]) + k
    twin = np.asarray(contigs.twin[:n])
    n_pairs = sum(1 for i, row in enumerate(perm)
                  if twin[row] != row)
    with open(path, "w") as fh:
        fh.write(f"Edge_num {len(perm)} {len(perm)}\n")
        fh.write("index\tlength\treverseComplement\n")
        i = 0
        while i < len(perm):
            row = perm[i]
            if twin[row] != row:
                fh.write(f"{i + 1}\t{lengths[row]}\t1\n")
                i += 2
            else:
                fh.write(f"{i + 1}\t{lengths[row]}\t0\n")
                i += 1
