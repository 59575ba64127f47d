"""Local gap assembly (graph/gapfill.py) vs known gap sequences.

Reference behavior: localAsm.c searchFgap/traceAlongDBgraph fills a
scaffold gap from the reads spanning it; prlReadFillGap's procGap
merges overlapping contig ends.
"""

import numpy as np
import pytest

from soapdenovo_trans_tpu.graph import gapfill
from soapdenovo_trans_tpu.ops import bits

K = 15


def _rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def _reads_over(seq, length=30, stride=2):
    return [seq[i: i + length]
            for i in range(0, len(seq) - length + 1, stride)]


def test_positive_gap_filled(rng):
    left = _rand_seq(rng, 80)
    gap = _rand_seq(rng, 25)
    right = _rand_seq(rng, 80)
    region = left[-40:] + gap + right[:40]
    reads = [np.asarray(bits.encode_seq(r), np.uint8)
             for r in _reads_over(region)]
    res = gapfill.fill_gaps([(left, right, len(gap))], [reads], K)
    assert res.filled[0]
    assert res.fill_seq[0] == gap
    assert res.overlap[0] == 0


def test_gap_not_filled_without_reads(rng):
    left = _rand_seq(rng, 60)
    right = _rand_seq(rng, 60)
    res = gapfill.fill_gaps([(left, right, 20)], [[]], K)
    assert not res.filled[0]


def test_overlap_merge(rng):
    core = _rand_seq(rng, 120)
    left = core[:80]
    right = core[60:]  # 20bp overlap
    res = gapfill.fill_gaps([(left, right, -20)], [[]], K)
    assert res.filled[0]
    assert res.overlap[0] == 20
    merged = left + right[int(res.overlap[0]):]
    assert merged == core


def test_small_overlap_found_by_walk(rng):
    # gap = 0 with a K-1 overlap is resolvable by the walk through
    # flank kmers alone (flanks are always inserted into the table)
    core = _rand_seq(rng, 100)
    left = core[:60]
    right = core[60 - (K - 1):]  # overlap K-1
    res = gapfill.fill_gaps([(left, right, -(K - 1))], [[]], K)
    assert res.filled[0]
    assert int(res.overlap[0]) == K - 1


def test_batch_mixed_gaps(rng):
    juncs, greads, want = [], [], []
    for gi in range(6):
        left = _rand_seq(rng, 70)
        gap = _rand_seq(rng, 10 + 3 * gi)
        right = _rand_seq(rng, 70)
        region = left[-40:] + gap + right[:40]
        juncs.append((left, right, len(gap)))
        greads.append([np.asarray(bits.encode_seq(r), np.uint8)
                       for r in _reads_over(region)])
        want.append(gap)
    res = gapfill.fill_gaps(juncs, greads, K)
    assert res.filled.all()
    assert list(res.fill_seq) == want


def test_gap_size_window_rejects(rng):
    left = _rand_seq(rng, 70)
    gap = _rand_seq(rng, 30)
    right = _rand_seq(rng, 70)
    region = left[-40:] + gap + right[:40]
    reads = [np.asarray(bits.encode_seq(r), np.uint8)
             for r in _reads_over(region)]
    # declared gap wildly off -> outside tol + K window -> rejected
    res = gapfill.fill_gaps([(left, right, 500)], [reads], K, tol=50)
    assert not res.filled[0]


def test_tangled_gap_decoy_branch(rng):
    """A high-coverage decoy branch inside the gap traps greedy
    heaviest-extension; the bounded-window shortest-path walk routes
    to the target regardless (reference escapes via bounded DFS with
    repeat masking, localAsm.c:564,1052-1261)."""
    left = _rand_seq(rng, 70)
    gap = _rand_seq(rng, 30)
    right = _rand_seq(rng, 70)
    region = left[-40:] + gap + right[:40]
    reads = [np.asarray(bits.encode_seq(r), np.uint8)
             for r in _reads_over(region, stride=4)]
    # decoy: shares the first 10bp of the gap then diverges to a dead
    # end, at 8x the coverage of the true path
    decoy = left[-20:] + gap[:10] + _rand_seq(rng, 30)
    for _ in range(8):
        for r in _reads_over(decoy, stride=4):
            reads.append(np.asarray(bits.encode_seq(r), np.uint8))
    res = gapfill.fill_gaps([(left, right, len(gap))], [reads], K)
    assert res.filled[0]
    assert res.fill_seq[0] == gap


def test_reads_cross_gap_fallback(rng):
    """Graph walk broken (an N inside the gap kills its k-mers): a
    single spanning read anchored by exact K-mers on both flanks
    bridges the gap (readsCrossGap, localAsm.c:2035)."""
    left = _rand_seq(rng, 70)
    gap = _rand_seq(rng, 12) + "N" + _rand_seq(rng, 12)
    right = _rand_seq(rng, 70)
    span = left[-K:] + gap + right[:K]
    reads = [np.asarray(bits.encode_seq(span), np.uint8)]
    res = gapfill.fill_gaps([(left, right, len(gap))], [reads], K)
    assert res.filled[0]
    assert res.fill_seq[0] == gap
    # and the reverse-complement spanning read works too
    reads_rc = [np.asarray(bits.encode_seq(bits.revcomp_str(span)),
                           np.uint8)]
    res2 = gapfill.fill_gaps([(left, right, len(gap))], [reads_rc], K)
    assert res2.filled[0]
    assert res2.fill_seq[0] == gap
