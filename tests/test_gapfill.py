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
