"""splitReps — repeat-edge duplication from read-path evidence
(semantics of solveReps/solvable/split1edge, reference
src/splitReps.c:166-505; exposed behind our contig -R)."""

import numpy as np
import pytest

from soapdenovo_trans_tpu.graph import contig_merge, split_reps, unitigs
from soapdenovo_trans_tpu.ops import bits

from .test_arcs import K, build_all, pad_batch

rng = np.random.default_rng(7)


def _unique_seq(n, k=K, taken=None):
    """Random sequence whose canonical k-mers are unique (incl. vs taken)."""
    taken = set() if taken is None else taken
    while True:
        s = "".join(rng.choice(list("ACGT"), size=n))
        cans = set()
        ok = True
        for j in range(n - k + 1):
            win = s[j:j + k]
            can = min(win, bits.revcomp_str(win))
            if can in cans or can in taken:
                ok = False
                break
            cans.add(can)
        if ok:
            taken |= cans
            return s, taken


def _repeat_fixture():
    """Two transcripts sharing an interior repeat M:
    T1 = A M B, T2 = C M D (A/B/C/D flank k-mers all distinct)."""
    taken = set()
    a, taken = _unique_seq(60, taken=taken)
    b, taken = _unique_seq(60, taken=taken)
    c, taken = _unique_seq(60, taken=taken)
    d, taken = _unique_seq(60, taken=taken)
    m, taken = _unique_seq(40, taken=taken)
    return a + m + b, c + m + d


def _read_paths(seqs, table, eg, patch):
    """Per-read edge paths via thread_reads slot output (what the
    pregraph's PathRecorder records)."""
    from soapdenovo_trans_tpu.graph import arcs as arcs_mod

    padded, lens = pad_batch(seqs)
    f, t, v = arcs_mod.thread_reads(padded, lens, table, eg, patch, K)
    r = len(seqs)
    slots = np.asarray(t).reshape(r, -1)
    ok = np.asarray(v).reshape(r, -1)
    paths = []
    for row in range(r):
        idx = np.nonzero(slots[row] >= 0)[0]
        if idx.size == 0:
            continue
        n_run = 1
        while n_run < idx.size and ok[row, idx[n_run]]:
            n_run += 1
        paths.append(slots[row, idx[:n_run]])
    return paths


def _triples(paths):
    tri = [np.stack([p[:-2], p[1:-1], p[2:]], axis=1)
           for p in paths if p.shape[0] >= 3]
    return (np.concatenate(tri, axis=0) if tri
            else np.zeros((0, 3), np.int64))


def _contig_seqs(eg, aset, table):
    ctg = contig_merge.concatenate(eg, aset)
    seqs = contig_merge.contig_sequences(ctg, table, K)
    out = set()
    for s in seqs:
        out.add(min(s, bits.revcomp_str(s)))
    return out


def test_solvable_repeat_is_split_and_concatenates_through():
    t1, t2 = _repeat_fixture()
    table, eg, patch, aset = build_all([t1, t1, t2, t2])
    paths = _read_paths([t1, t2], table, eg, patch)
    tri = _triples(paths)
    assert tri.shape[0] >= 2  # (A,M,B) and (C,M,D) at least

    n_before = int(eg.n_edges)
    eg2, aset2, n_split = split_reps.solve_reps(eg, aset, tri)
    assert n_split == 1
    assert int(eg2.n_edges) == n_before + 2  # copy + its twin

    # after the split both full transcripts concatenate straight through
    canon = _contig_seqs(eg2, aset2, table)
    assert min(t1, bits.revcomp_str(t1)) in canon
    assert min(t2, bits.revcomp_str(t2)) in canon

    # without the split the repeat keeps 2-in/2-out and blocks merging
    canon0 = _contig_seqs(eg, aset, table)
    assert min(t1, bits.revcomp_str(t1)) not in canon0


def test_crossing_reads_block_the_split():
    """Reads traversing both (A,M,B) and (A,M,D) -> gothrough is not a
    perfect matching -> solvable() == 0 (splitReps.c:272-303)."""
    t1, t2 = _repeat_fixture()
    a_m = t1[:100]            # A + M
    m_d = t2[60:]             # M + D
    cross = a_m + t2[100:]    # A M D chimera
    table, eg, patch, aset = build_all([t1, t1, t2, t2, cross])
    paths = _read_paths([t1, t2, cross], table, eg, patch)
    eg2, aset2, n_split = split_reps.solve_reps(eg, aset, _triples(paths))
    assert n_split == 0
    assert int(eg2.n_edges) == int(eg.n_edges)


def test_unpaired_evidence_blocks_the_split():
    """Only one of the two pairings observed -> no perfect matching."""
    t1, t2 = _repeat_fixture()
    table, eg, patch, aset = build_all([t1, t1, t2, t2])
    paths = _read_paths([t1], table, eg, patch)  # only (A,M,B)
    eg2, _aset2, n_split = split_reps.solve_reps(eg, aset, _triples(paths))
    assert n_split == 0
