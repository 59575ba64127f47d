"""Vectorized read -> canonical k-mer chopping.

TPU-native equivalent of chopKmer4read (reference:
src/prlHashReads.c:164-310): every read is decomposed into all its
K-mers, each canonicalized to min(kmer, revcomp), with the preceding
and following base recorded *in canonical orientation* (code 4 when
absent).  Those prev/next observations become the de Bruijn graph's
left/right edge-coverage counters.

The reference walks each read serially per thread with a rolling
word/bal_word pair; here one ``lax.scan`` over window positions rolls
the forward and reverse k-mers for ALL reads in a batch at once
(R-wide vector ops per step), emitting a (num_windows, R, ...) block
that is flattened to a flat k-mer stream.

Deviation from the reference: k-mer windows containing an 'N' are
masked out entirely.  The reference (with default N_kmer=0) feeds a
zero-valued "InvalidKmer" into the canonical branch in that case
(prlHashReads.c:175-196), which conflates N-windows with poly-A
k-mers; masking is the intended behavior.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import bits


class KmerStream(NamedTuple):
    """A flat batch of canonical k-mer observations."""

    kmers: jnp.ndarray  # (N, W) uint32, canonical
    prev: jnp.ndarray   # (N,) uint8 base before the kmer (canon orient; 4=none)
    next: jnp.ndarray   # (N,) uint8 base after the kmer (canon orient; 4=none)
    valid: jnp.ndarray  # (N,) bool
    read_id: jnp.ndarray  # (N,) int32 originating read row
    pos: jnp.ndarray    # (N,) int32 window start within the read
    is_rc: jnp.ndarray  # (N,) bool — canonical is the reverse complement


@functools.partial(jax.jit, static_argnums=(2,))
def chop_reads(seqs: jnp.ndarray, lengths: jnp.ndarray, k: int) -> KmerStream:
    """Chop a padded read batch into canonical k-mers.

    seqs: (R, L) uint8 base codes (0..3, 4 for N/pad), lengths: (R,).
    Returns a KmerStream with N = R * (L - K + 1) rows (masked rows
    have valid=False), ordered read-major then position.

    All windows pack simultaneously: each uint32 lane of the k-mer is
    a fixed-weight sum of <=16 strided base slices (K shifted ORs over
    (R, P) matrices), so there is no sequential rolling scan — every
    op is batch-wide, which matters both for VPU utilization and for
    dispatch counts.
    """
    r, l = seqs.shape
    assert l >= k, f"padded read length {l} < K={k}"
    p = l - k + 1
    w = bits.words_for_k(k)

    b = (seqs & 3).astype(jnp.uint32)  # N clamped; N windows masked below
    is_n = (seqs >= 4).astype(jnp.int32)
    n_prefix = jnp.concatenate(
        [jnp.zeros((r, 1), jnp.int32), jnp.cumsum(is_n, axis=1)], axis=1)

    words = []
    for wi in range(w):           # wi = 0 is the most-significant lane
        q = w - 1 - wi            # lane index counted from the LSB
        acc = jnp.zeros((r, p), jnp.uint32)
        for i in range(k):        # base i of the window
            pbit = 2 * (k - 1 - i)
            if pbit // 32 != q:
                continue
            acc = acc | (b[:, i : i + p] << (pbit % 32))
        words.append(acc)
    fwd = jnp.stack(words, axis=-1).reshape(r * p, w)

    rc = bits.reverse_complement(fwd, k)
    can, use_rc = bits.canonical_pair(fwd, rc, k)

    win = jnp.arange(p, dtype=jnp.int32)[None, :]
    valid = ((win + k) <= lengths[:, None]) & \
        ((n_prefix[:, k:] - n_prefix[:, :p]) == 0)

    prev_f = jnp.concatenate(
        [jnp.full((r, 1), 4, jnp.uint8), seqs[:, : p - 1]], axis=1)
    next_f = jnp.concatenate(
        [seqs[:, k:], jnp.full((r, 1), 4, jnp.uint8)], axis=1)
    next_f = jnp.where((win + k) < lengths[:, None], next_f, jnp.uint8(4))

    prev_f = prev_f.reshape(-1)
    next_f = next_f.reshape(-1)
    use_rc_f = use_rc.reshape(-1)
    prev_c = jnp.where(use_rc_f,
                       jnp.where(next_f < 4, next_f ^ 2, 4), prev_f)
    next_c = jnp.where(use_rc_f,
                       jnp.where(prev_f < 4, prev_f ^ 2, 4), next_f)

    read_id = jnp.repeat(jnp.arange(r, dtype=jnp.int32), p)
    pos = jnp.tile(jnp.arange(p, dtype=jnp.int32), r)
    return KmerStream(can, prev_c.astype(jnp.uint8),
                      next_c.astype(jnp.uint8), valid.reshape(-1),
                      read_id, pos, use_rc_f)
