"""Contig-level connections (CONNECTs) from read placements.

Device-side equivalents of the scaffold stage's link builders:

* pe_links — connectByPE_grad/attach1PE (reference
  src/attachPEinfo.c:269-423): mate pairs are consecutive read
  numbers; gap = ins - K + pos1 + pos2 - len1 - len2, accepted in
  [-ins/10, ins]; emits (e1 -> e2) plus the twin connection.
* se_links — singleRead2connection (src/transcriptome.c:256-310):
  consecutive distinct unique contigs hit by the same read, ordered
  by position in the read; gap = ctgOff2 - ctgOff1 - len1, negative
  rejected; emits connection + twin with an SE support count.
* aggregate — add1Connect's weight accumulation (connect.c) as a
  sort + boundary reduction; gap estimates are averaged (the
  reference keeps the first-seen gap; the mean is strictly better
  and changes nothing downstream but tie-breaks).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import dictionary


class ConnSet(NamedTuple):
    """COO connection table over directed contig rows."""

    from_ctg: jnp.ndarray  # (N,) int32
    to_ctg: jnp.ndarray    # (N,) int32
    gap: jnp.ndarray       # (N,) int32 mean gap estimate
    weight: jnp.ndarray    # (N,) int32 total supporting observations
    se_count: jnp.ndarray  # (N,) int32 single-read supports
    n: jnp.ndarray


def _gather_or(x, idx, fill):
    safe = jnp.clip(idx, 0, x.shape[0] - 1)
    return jnp.where((idx >= 0) & (idx < x.shape[0]), x[safe], fill)


@jax.jit
def pe_link_candidates(ctg, pos, twin, ctg_len, insert_size, k):
    """(from, to, gap, valid) from consecutive-pair placements.
    ctg/pos: (R,) best placements (R even; pairs are (2i, 2i+1)).

    ctg_len holds FULL lengths (K + tail).  The reference's gap
    (attachPEinfo.c:303: ins - K + p1 + p2 - len1 - len2, lengths
    K-exclusive) equals physical_gap + K; the acceptance window
    [-ins/10, ins] applies to that convention, but we STORE the
    physical gap (distance between contig ends on the transcript,
    negative = K-overlap region shared through a short repeat)."""
    e1 = ctg[0::2]
    p1 = pos[0::2]
    bal_e2 = ctg[1::2]
    p2 = pos[1::2]
    ok = (e1 >= 0) & (bal_e2 >= 0) & (e1 != bal_e2)
    e2 = _gather_or(twin, bal_e2, -1)
    bal_e1 = _gather_or(twin, e1, -1)
    ok &= (e2 >= 0) & (e1 != e2)  # same-contig pairs only re-estimate IS
    len1 = _gather_or(ctg_len, e1, 0)
    len2 = _gather_or(ctg_len, e2, 0)
    gap_ref = insert_size + k + p1 + p2 - len1 - len2
    ok &= (gap_ref >= -(insert_size // 10)) & (gap_ref <= insert_size)
    gap = gap_ref - k  # physical
    f = jnp.concatenate([jnp.where(ok, e1, -1), jnp.where(ok, bal_e2, -1)])
    t = jnp.concatenate([jnp.where(ok, e2, -1), jnp.where(ok, bal_e1, -1)])
    g = jnp.concatenate([gap, gap])
    return f, t, g, jnp.concatenate([ok, ok])


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def se_link_candidates(g_ctg, g_off, g_read_off, g_valid,
                       r: int, groups_per_read: int, k: int,
                       twin=None, ctg_len=None, unique=None):
    """(from, to, gap, valid) from per-read multi-contig hit groups.

    Group arrays are (R * P) flat, P = groups_per_read slots per read.
    ctg_len holds FULL lengths (K + tail).

    The reference's .ctg2Read "pos" column is
    readOffset - contigOffset (recordAlldgn, prlRead2Ctg.c:573) and
    singleRead2connection's gapLen = pos2 - pos1 - len1 uses
    K-exclusive lengths — i.e. physical_gap + K.  The >= 0 acceptance
    follows that convention; we store the physical gap.
    """
    p = groups_per_read
    BIG = jnp.int32(2**30)
    off = g_read_off.reshape(r, p)
    ctg = g_ctg.reshape(r, p)
    coff = g_off.reshape(r, p)
    valid = g_valid.reshape(r, p)
    if unique is not None:
        valid &= _gather_or(unique, ctg.reshape(-1), False).reshape(r, p)
    # skip self-twin (palindromic) contigs, like isSameAsTwin
    valid &= _gather_or(twin, ctg.reshape(-1), -1).reshape(r, p) != ctg

    key = jnp.where(valid, off, BIG)
    relpos = off - coff  # readOffset - contigOffset
    skey, sctg, srel = jax.lax.sort(
        (key, ctg, relpos), num_keys=1, dimension=1)
    v = skey < BIG
    c1 = sctg[:, :-1]
    c2 = sctg[:, 1:]
    ok = v[:, :-1] & v[:, 1:] & (c1 != c2)
    len1 = _gather_or(ctg_len, jnp.clip(c1.reshape(-1), 0), 0
                      ).reshape(r, p - 1)
    gap_ref = srel[:, 1:] - srel[:, :-1] - (len1 - k)
    ok &= gap_ref >= 0
    gap = gap_ref - k
    tw1 = _gather_or(twin, jnp.clip(c1.reshape(-1), 0), -1).reshape(r, p - 1)
    tw2 = _gather_or(twin, jnp.clip(c2.reshape(-1), 0), -1).reshape(r, p - 1)
    f = jnp.concatenate([jnp.where(ok, c1, -1).reshape(-1),
                         jnp.where(ok, tw2, -1).reshape(-1)])
    t = jnp.concatenate([jnp.where(ok, c2, -1).reshape(-1),
                         jnp.where(ok, tw1, -1).reshape(-1)])
    g = jnp.concatenate([gap.reshape(-1), gap.reshape(-1)])
    vv = jnp.concatenate([ok.reshape(-1), ok.reshape(-1)])
    return f, t, g, vv


@jax.jit
def _aggregate_device(f, t, g, is_se, valid):
    BIG = jnp.int32(2**30)
    n = f.shape[0]
    fk = jnp.where(valid, f, BIG)
    tk = jnp.where(valid, t, BIG)
    sf, st, sg, sse = jax.lax.sort(
        (fk, tk, jnp.where(valid, g, 0),
         jnp.where(valid, is_se.astype(jnp.int32), 0)), num_keys=2)
    real = sf < BIG
    first = jnp.concatenate(
        [jnp.ones(1, bool), (sf[1:] != sf[:-1]) | (st[1:] != st[:-1])])
    first &= real
    idx = jnp.arange(n, dtype=jnp.int32)
    (hidx,) = jax.lax.sort((jnp.where(first, idx, n),), num_keys=1)
    n_real = jnp.sum(real.astype(jnp.int32))
    nxt = jnp.concatenate([hidx[1:], jnp.full(1, n, jnp.int32)])
    end = jnp.minimum(nxt, n_real)
    weight = jnp.maximum(end - hidx, 0)
    pg = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(sg)])
    pse = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(sse)])
    gsum = pg[end] - pg[jnp.clip(hidx, 0, n)]
    sesum = pse[end] - pse[jnp.clip(hidx, 0, n)]
    live = hidx < n
    gi = jnp.clip(hidx, 0, n - 1)
    uf = jnp.where(live, sf[gi], -1)
    ut = jnp.where(live, st[gi], -1)
    gmean = jnp.where(weight > 0, gsum // jnp.maximum(weight, 1), 0)
    n_conn = jnp.sum(first.astype(jnp.int32))
    return uf, ut, gmean, weight, sesum, n_conn


def aggregate(f, t, g, is_se, valid) -> ConnSet:
    uf, ut, gmean, weight, sesum, n_conn = _aggregate_device(
        f, t, g, is_se, valid)
    n = int(n_conn)
    cap = dictionary.round_up(max(n, 1))

    def fit(x, fill):
        if x.shape[0] < cap:
            x = jnp.concatenate(
                [x, jnp.full(cap - x.shape[0], fill, x.dtype)])
        return x[:cap]

    live = jnp.arange(cap) < n
    return ConnSet(
        jnp.where(live, fit(uf, -1), -1),
        jnp.where(live, fit(ut, -1), -1),
        jnp.where(live, fit(gmean, 0), 0),
        jnp.where(live, fit(weight, 0), 0),
        jnp.where(live, fit(sesum, 0), 0),
        jnp.int32(n))


@jax.jit
def same_contig_fragments(ctg, pos, twin, ctg_len):
    """Fragment sizes of pairs whose mates land on the same contig
    (reference attach1PE's e1 == e2 branch + calcuIS,
    attachPEinfo.c:283-300, 425): realpeSize = full_len - p1 - p2.
    Returns (sizes, valid) per pair."""
    e1 = ctg[0::2]
    p1 = pos[0::2]
    bal_e2 = ctg[1::2]
    p2 = pos[1::2]
    e2 = _gather_or(twin, bal_e2, -1)
    ok = (e1 >= 0) & (bal_e2 >= 0) & (e1 == e2) & (e1 != bal_e2)
    size = _gather_or(ctg_len, e1, 0) - p1 - p2
    ok &= size > 0
    return jnp.where(ok, size, 0), ok


def estimate_insert_size(ctg, pos, twin, ctg_len, declared: int,
                         min_pairs: int = 100):
    """Mean observed fragment size on long contigs; falls back to the
    declared avg_ins below min_pairs observations."""
    size, ok = same_contig_fragments(ctg, pos, twin, ctg_len)
    ok = ok & (_gather_or(ctg_len, ctg[0::2], 0) > declared)
    n = int(jnp.sum(ok))
    if n < min_pairs:
        return declared, n
    est = int(jnp.sum(jnp.where(ok, size, 0))) // n
    return est, n
