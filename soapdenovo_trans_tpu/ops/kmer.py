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
    """
    r, l = seqs.shape
    assert l >= k, f"padded read length {l} < K={k}"
    num_win = l - k + 1

    comp = jnp.where(seqs < 4, seqs ^ 2, jnp.uint8(4))
    is_n = (seqs >= 4).astype(jnp.int32)
    # n_prefix[j] = number of N among bases [0, j)
    n_prefix = jnp.concatenate(
        [jnp.zeros((r, 1), jnp.int32), jnp.cumsum(is_n, axis=1)], axis=1
    )

    # Build the first window's forward kmer by scanning K bases.
    def init_step(km, j):
        return bits.next_kmer(km, seqs[:, j].astype(jnp.uint32), k), None

    # derive the zero from seqs so the carry keeps seqs' device-varying
    # axes when chop_reads runs inside shard_map
    zero0 = bits.zero(k, (r,)) | (seqs[:, :1].astype(jnp.uint32) & 0)
    km0, _ = jax.lax.scan(init_step, zero0, jnp.arange(k))
    rc0 = bits.reverse_complement(km0, k)

    def roll(carry, j):
        fwd, rc = carry
        # Emit window starting at j (fwd covers bases j..j+K-1).
        can, use_rc = bits.canonical_pair(fwd, rc, k)
        prev_f = jnp.where(j > 0, seqs[:, jnp.maximum(j - 1, 0)], jnp.uint8(4))
        nxt_idx = jnp.minimum(j + k, l - 1)
        in_range = j + k < l
        nxt_valid = in_range & (j + k < lengths)
        next_f = jnp.where(nxt_valid, seqs[:, nxt_idx], jnp.uint8(4))
        prev_f = jnp.where(j - 1 < lengths, prev_f, jnp.uint8(4))
        # canonical-orientation prev/next
        prev_c = jnp.where(use_rc, jnp.where(next_f < 4, next_f ^ 2, 4), prev_f)
        next_c = jnp.where(use_rc, jnp.where(prev_f < 4, prev_f ^ 2, 4), next_f)
        valid = (j + k <= lengths) & (
            (n_prefix[:, jnp.minimum(j + k, l)] - n_prefix[:, j]) == 0
        )
        # Roll to window j+1 by appending base j+K.
        b = seqs[:, nxt_idx].astype(jnp.uint32)
        bc = comp[:, nxt_idx].astype(jnp.uint32)
        fwd_n = bits.next_kmer(fwd, b, k)
        rc_n = bits.prev_kmer(rc, bc, k)
        return (fwd_n, rc_n), (can, prev_c.astype(jnp.uint8),
                               next_c.astype(jnp.uint8), valid, use_rc)

    (_, _), (kms, prevs, nexts, valids, rcs) = jax.lax.scan(
        roll, (km0, rc0), jnp.arange(num_win)
    )

    # (num_win, R, ...) -> read-major flat order (R, num_win) -> (N,)
    w = bits.words_for_k(k)
    kms = jnp.swapaxes(kms, 0, 1).reshape(r * num_win, w)
    prevs = jnp.swapaxes(prevs, 0, 1).reshape(-1)
    nexts = jnp.swapaxes(nexts, 0, 1).reshape(-1)
    valids = jnp.swapaxes(valids, 0, 1).reshape(-1)
    rcs = jnp.swapaxes(rcs, 0, 1).reshape(-1)
    read_id = jnp.repeat(jnp.arange(r, dtype=jnp.int32), num_win)
    pos = jnp.tile(jnp.arange(num_win, dtype=jnp.int32), r)
    return KmerStream(kms, prevs, nexts, valids, read_id, pos, rcs)
