"""Stage 3 — map: place reads on contigs by k-mer voting.

TPU-native equivalents of call_align (reference src/map.c:64):

* build_contig_index — prlContig2nodes (src/prlHashCtg.c:287-425):
  chop every twin-pair representative contig (>= K+2 bp) into
  canonical k-mers; each k-mer stores (contig, position, orientation);
  k-mers occurring more than once are ambiguous and dropped (the
  reference marks them deleted, prlHashCtg.c:116-144).
* map_reads — prlRead2Ctg (src/prlRead2Ctg.c:656-1086, parse1read
  :233-354): per read, look up all k-mers, vote by contig, require
  >= multi = max(5, min(len, map_len) - K + 1) agreeing k-mers; the
  winning contig/position/orientation follow parse1read's formulas;
  every qualifying (read, contig) group is kept for the .ctg2Read
  stream (transcript-stage single-read linking); reads qualifying on
  >= 2 contigs get the gap-spanning footprint flag.

Voting is one sort of (read, contig) pairs + boundary scans —
no per-read loops.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import contig_merge
from ..ops import bits, dictionary, kmer


class ContigIndex(NamedTuple):
    """Sorted canonical k-mer -> unique (contig, pos, orient)."""

    keys: jnp.ndarray     # (cap, W) uint32 ascending
    ctg: jnp.ndarray      # (cap,) int32 contig row (twin-pair rep)
    pos: jnp.ndarray      # (cap,) int32 kmer start within contig seq
    is_rc: jnp.ndarray    # (cap,) bool — canonical kmer is revcomp of
                          # the contig-oriented window
    n: jnp.ndarray        # () int32
    ctg_len: jnp.ndarray  # (Ccap,) int32 full contig lengths (K + tail)
    twin: jnp.ndarray     # (Ccap,) int32


class ReadPlacements(NamedTuple):
    """Per read: best contig placement (reference .readOnContig) and
    the full >=multi hit groups (reference .ctg2Read)."""

    ctg: jnp.ndarray       # (R,) int32 contig row or -1
    pos: jnp.ndarray       # (R,) int32 read start on contig (0-based,
                           # may be negative)
    reverse: jnp.ndarray   # (R,) bool mapped to twin strand
    footprint: jnp.ndarray  # (R,) bool qualified on >= 2 contigs
    # hit groups, flat COO over (read, contig):
    g_read: jnp.ndarray    # (G,) int32
    g_ctg: jnp.ndarray     # (G,) int32 (already orientation-resolved)
    g_ctg_off: jnp.ndarray  # (G,) int32 contig offset of first kmer hit
    g_read_off: jnp.ndarray  # (G,) int32 1-based read offset of that kmer
    g_align: jnp.ndarray   # (G,) int32 number of agreeing kmers
    g_valid: jnp.ndarray   # (G,) bool
    # raw (index-stored, twin-pair representative) coordinates for the
    # reference file contracts (.ctg2Read/.readOnContig/.readInformation
    # use the unresolved contig id + an orientation char,
    # prlRead2Ctg.c:530-614):
    g_raw_ctg: jnp.ndarray  # (G,) int32 rep contig row
    g_raw_off: jnp.ndarray  # (G,) int32 kmer offset in rep orientation
    g_same: jnp.ndarray     # (G,) bool  '+' (True) / '-' (False)


def contig_code_matrix(ctg: contig_merge.Contigs, table, k: int):
    """(C, Lmax) uint8 base-code matrix of twin-pair representative
    contigs (host side; device chopping consumes it batched)."""
    n = int(ctg.n)
    twin = np.asarray(ctg.twin[:n])
    lengths = np.asarray(ctg.length[:n]) + k
    seqs = contig_merge.contig_sequences(ctg, table, k)
    rep = [c for c in range(n) if c <= twin[c] and lengths[c] >= k + 2]
    if not rep:
        return np.zeros((0, k + 2), np.uint8), np.zeros(0, np.int32), []
    lmax = max(lengths[c] for c in rep)
    codes = np.full((len(rep), lmax), 4, np.uint8)
    lens = np.zeros(len(rep), np.int32)
    for i, c in enumerate(rep):
        codes[i, : lengths[c]] = bits.encode_seq(seqs[c])
        lens[i] = lengths[c]
    return codes, lens, rep


@functools.partial(jax.jit, static_argnums=(2,))
def _index_device(codes, lens, k: int, rep_ids):
    stream = kmer.chop_reads(codes, lens, k)
    w = stream.kmers.shape[-1]
    keys = jnp.where(stream.valid[:, None], stream.kmers,
                     jnp.uint32(0xFFFFFFFF))
    ctg_of = rep_ids[stream.read_id]
    payload = jnp.stack(
        [jnp.where(stream.valid, ctg_of, -1).astype(jnp.int32),
         stream.pos.astype(jnp.int32),
         stream.is_rc.astype(jnp.int32)], axis=-1)
    res = jax.lax.sort(
        tuple(keys[:, i] for i in range(w)) +
        tuple(payload[:, i] for i in range(3)), num_keys=w)
    skeys = jnp.stack(res[:w], axis=-1)
    sc, sp, srz = res[w], res[w + 1], res[w + 2]
    svalid = sc >= 0
    first = jnp.concatenate(
        [jnp.ones(1, bool), jnp.any(skeys[1:] != skeys[:-1], axis=-1)])
    last = jnp.concatenate(
        [jnp.any(skeys[1:] != skeys[:-1], axis=-1), jnp.ones(1, bool)])
    unique = first & last & svalid  # exactly-once kmers only
    n_unique = jnp.sum(unique.astype(jnp.int32))
    # compact via 1-operand sort of head positions
    n_rows = skeys.shape[0]
    idx = jnp.arange(n_rows, dtype=jnp.int32)
    (hidx,) = jax.lax.sort((jnp.where(unique, idx, n_rows),), num_keys=1)
    live = hidx < n_rows
    g = jnp.clip(hidx, 0, n_rows - 1)
    return (jnp.where(live[:, None], skeys[g], jnp.uint32(0xFFFFFFFF)),
            jnp.where(live, sc[g], -1),
            jnp.where(live, sp[g], -1),
            jnp.where(live, srz[g].astype(bool), False),
            n_unique)


def build_contig_index(ctg: contig_merge.Contigs, table, k: int
                       ) -> ContigIndex:
    codes, lens, rep = contig_code_matrix(ctg, table, k)
    keys, c, p, rz, n_unique = _index_device(
        jnp.asarray(codes), jnp.asarray(lens), k,
        jnp.asarray(np.asarray(rep, np.int32)))
    n = int(n_unique)
    cap = dictionary.round_up(max(n, 1))
    fit = dictionary.fit_cap
    return ContigIndex(
        fit(keys, cap, jnp.uint32(0xFFFFFFFF)), fit(c, cap, -1),
        fit(p, cap, -1), fit(rz, cap, False), jnp.int32(n),
        ctg.length + k, ctg.twin)


@functools.partial(jax.jit, static_argnums=(3, 4))
def map_reads(seqs, lengths, index: ContigIndex, k: int,
              map_len: int = 32) -> ReadPlacements:
    """Vectorized parse1read voting over a padded read batch."""
    r, l = seqs.shape
    p = l - k + 1
    stream = kmer.chop_reads(seqs, lengths, k)
    row = dictionary.lookup(index.keys, stream.kmers)
    hit = (row >= 0) & stream.valid
    g = jnp.clip(row, 0)
    ctg_of = jnp.where(hit, index.ctg[g], -1).reshape(r, p)
    kpos = jnp.where(hit, index.pos[g], 0).reshape(r, p)
    stored_rc = jnp.where(hit, index.is_rc[g], False).reshape(r, p)
    win_rc = stream.is_rc.reshape(r, p)
    return vote(ctg_of, kpos, stored_rc, win_rc, lengths,
                index.ctg_len, index.twin, k, map_len)


def vote(ctg_of, kpos, stored_rc, win_rc, lengths, ctg_len_all,
         twin_all, k: int, map_len: int) -> ReadPlacements:
    """parse1read's per-read voting given resolved k-mer hits — pure
    local math, shared by the dense path and the sharded map stage
    (which resolves hits with a routed lookup first).

    Formulated FLAT over all r*p (read, window) slots: one global
    (rid, contig, window) 3-key sort groups each read's hits by
    contig with the first-in-read hit at each group head, and 1-D
    scans read off per-group stats.  The earlier per-row
    (dimension=1) sorts + take_along_axis gathers compiled
    superlinearly in r on the TPU backend, pinning the read pass to
    4096-row dispatches (VERDICT r4 #3)."""
    r, p = ctg_of.shape
    n = r * p
    BIG = jnp.int32(2**30)
    rid = jnp.broadcast_to(
        jnp.arange(r, dtype=jnp.int32)[:, None], (r, p)).reshape(-1)
    widx = jnp.broadcast_to(
        jnp.arange(p, dtype=jnp.int32), (r, p)).reshape(-1)
    ctgm = jnp.where(ctg_of >= 0, ctg_of, BIG).reshape(-1)

    srid, sctg, swidx, skpos, ssrc, swrc = jax.lax.sort(
        (rid, ctgm, widx, kpos.reshape(-1),
         stored_rc.reshape(-1).astype(jnp.int32),
         win_rc.reshape(-1).astype(jnp.int32)), num_keys=3)
    valid = sctg < BIG
    head = jnp.concatenate(
        [jnp.ones(1, bool),
         (srid[1:] != srid[:-1]) | (sctg[1:] != sctg[:-1])])
    # votes per group = run length = next head index - head index
    idx = jnp.arange(n, dtype=jnp.int32)
    next_head = jnp.flip(jax.lax.associative_scan(
        jnp.minimum, jnp.flip(jnp.where(head, idx, n))))
    next_head = jnp.concatenate([next_head[1:], jnp.full(1, n, jnp.int32)])
    votes = jnp.where(head, next_head - idx, 0)

    # threshold (reference: multi = max(5, min(len, map_len) - K + 1))
    eff = jnp.minimum(lengths, map_len)
    multi = jnp.maximum(5, eff - k + 1)[jnp.clip(srid, 0)]
    qual = head & valid & (votes >= multi)

    # orientation resolution at each group head (parse1read:311-327);
    # swidx at a head is the group's first-in-read window (windows are
    # the 3rd sort key)
    g_ctg_raw = sctg
    cg = jnp.clip(g_ctg_raw, 0, ctg_len_all.shape[0] - 1)
    ctg_len_g = ctg_len_all[cg]
    i1 = swidx + 1  # 1-based kmer offset in read
    same = ssrc == swrc
    o_ctg = jnp.where(same, g_ctg_raw, twin_all[cg])
    o_pos = jnp.where(same, skpos - i1 + 1,
                      ctg_len_g - skpos - k - i1 + 1)
    o_off = jnp.where(same, skpos, ctg_len_g - skpos - k)

    # best group per read: max votes among qualifying; ties go to the
    # group first encountered in the read (reference parse1read keeps
    # the earliest `flag > maxOcc` winner, prlRead2Ctg.c:285-290).
    # Second 2-key sort puts each read's best-scoring head first.
    p2 = 1 << int(p).bit_length()
    score = jnp.where(qual, votes * (2 * p2) + (p2 - 1 - swidx), -1)
    brid, _, b_ctg, b_pos, b_same, b_has = jax.lax.sort(
        (srid, -score, o_ctg, o_pos, same.astype(jnp.int32),
         (score > 0).astype(jnp.int32)), num_keys=2)
    bhead = jnp.concatenate([jnp.ones(1, bool), brid[1:] != brid[:-1]])
    tgt = jnp.where(bhead, brid, r)
    has_r = jnp.zeros(r, bool).at[tgt].set(
        b_has.astype(bool), mode="drop")
    ctg_best_r = jnp.full(r, -1, jnp.int32).at[tgt].set(
        b_ctg, mode="drop")
    pos_best_r = jnp.zeros(r, jnp.int32).at[tgt].set(b_pos, mode="drop")
    rev_r = jnp.zeros(r, bool).at[tgt].set(
        ~b_same.astype(bool), mode="drop")
    ctg_best = jnp.where(has_r, ctg_best_r, -1)
    pos_best = jnp.where(has_r, pos_best_r, 0)
    rev_best = jnp.where(has_r, rev_r, False)

    # footprint: >= 2 contigs hit by >= 2 kmers each (counter2,
    # prlRead2Ctg.c:277-300) — gap-spanning candidates
    ge2 = (head & valid & (votes >= 2)).astype(jnp.int32)
    n_ge2 = jax.ops.segment_sum(ge2, srid, num_segments=r)
    footprint = n_ge2 >= 2

    return ReadPlacements(
        ctg_best, pos_best, rev_best, footprint,
        srid, o_ctg, o_off, i1, votes, qual,
        g_ctg_raw, skpos, same)
