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
    (which resolves hits with a routed lookup first)."""
    r, p = ctg_of.shape
    win_idx = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32), (r, p))

    # group hits by (read, contig): sort contig ids within each read row
    key = jnp.where(ctg_of >= 0, ctg_of, jnp.int32(2**30))
    skey, skpos, s_rc, s_widx = jax.lax.sort(
        (key, kpos, stored_rc.astype(jnp.int32), win_idx),
        num_keys=1, dimension=1)
    valid_s = skey < 2**30
    firstg = jnp.concatenate(
        [jnp.ones((r, 1), bool), skey[:, 1:] != skey[:, :-1]], axis=1)
    firstg &= valid_s
    # votes per group: next group start - my start (within the row)
    col = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32), (r, p))
    gstart = jnp.where(firstg, col, p)
    (gpos_sorted,) = jax.lax.sort((gstart,), num_keys=1, dimension=1)
    nvalid = jnp.sum(valid_s.astype(jnp.int32), axis=1, keepdims=True)
    gnext = jnp.concatenate(
        [gpos_sorted[:, 1:], jnp.full((r, 1), p, jnp.int32)], axis=1)
    gend = jnp.minimum(gnext, nvalid)
    votes = jnp.maximum(gend - gpos_sorted, 0)  # per group slot

    # threshold (reference: multi = max(5, min(len, map_len) - K + 1))
    eff = jnp.minimum(lengths, map_len)
    multi = jnp.maximum(5, eff - k + 1)[:, None]

    glive = gpos_sorted < p
    gi = jnp.clip(gpos_sorted, 0, p - 1)
    g_ctg_raw = jnp.take_along_axis(skey, gi, axis=1)
    qual = glive & (votes >= multi)
    # the group's FIRST kmer in read order = min window idx in group:
    # within a group (equal contig) sort put them in kpos order, not
    # window order — recover min window idx via a segmented min scan.
    seg_id = jnp.cumsum(firstg.astype(jnp.int32), axis=1)
    BIG = jnp.int32(2**30)
    widx_masked = jnp.where(valid_s, s_widx, BIG)
    # segmented min: sort (seg_id, widx) then take first of each seg
    k2, v2 = jax.lax.sort((seg_id, widx_masked), num_keys=2, dimension=1)
    first2 = jnp.concatenate(
        [jnp.ones((r, 1), bool), k2[:, 1:] != k2[:, :-1]], axis=1)
    # compact (group -> min widx) pairs to the front IN GROUP ORDER:
    # sort by group id (unique at first2 positions), carry the min.
    _, g_minw = jax.lax.sort(
        (jnp.where(first2, k2, BIG), jnp.where(first2, v2, BIG)),
        num_keys=1, dimension=1)
    # slot j now holds group j's first-in-read window index

    # also need kpos/stored_rc of that min-window hit: gather original
    gm = jnp.clip(g_minw, 0, p - 1)
    g_kpos = jnp.take_along_axis(kpos, gm, axis=1)
    g_src = jnp.take_along_axis(stored_rc, gm, axis=1)
    g_wrc = jnp.take_along_axis(win_rc, gm, axis=1)

    # orientation resolution (parse1read:311-327)
    ctg_len_g = ctg_len_all[jnp.clip(g_ctg_raw, 0, None)]
    i1 = g_minw + 1  # 1-based kmer offset in read
    same = g_src == g_wrc  # stored orientation matches window orientation
    o_ctg = jnp.where(same, g_ctg_raw,
                      twin_all[jnp.clip(g_ctg_raw, 0, None)])
    o_pos = jnp.where(same, g_kpos - i1 + 1,
                      ctg_len_g - g_kpos - k - i1 + 1)
    o_off = jnp.where(same, g_kpos, ctg_len_g - g_kpos - k)

    # best group per read: max votes among qualifying; ties go to the
    # group first encountered in the read (reference parse1read keeps
    # the earliest `flag > maxOcc` winner, prlRead2Ctg.c:285-290)
    p2 = 1 << int(p).bit_length()
    score = jnp.where(qual, votes * (2 * p2) + (p2 - 1 - g_minw), -1)
    best = jnp.argmax(score, axis=1)
    has = jnp.take_along_axis(score, best[:, None], axis=1)[:, 0] > 0
    take = lambda x: jnp.take_along_axis(x, best[:, None], axis=1)[:, 0]
    ctg_best = jnp.where(has, take(o_ctg), -1)
    pos_best = jnp.where(has, take(o_pos), 0)
    rev_best = jnp.where(has, ~take(same), False)
    # footprint: >= 2 contigs hit by >= 2 kmers each (counter2,
    # prlRead2Ctg.c:277-300) — gap-spanning candidates
    n_ge2 = jnp.sum((glive & (votes >= 2)).astype(jnp.int32), axis=1)
    footprint = n_ge2 >= 2

    rid = jnp.broadcast_to(
        jnp.arange(r, dtype=jnp.int32)[:, None], (r, p))
    return ReadPlacements(
        ctg_best, pos_best, rev_best, footprint,
        rid.reshape(-1), o_ctg.reshape(-1), o_off.reshape(-1),
        i1.reshape(-1), votes.reshape(-1), qual.reshape(-1),
        g_ctg_raw.reshape(-1), g_kpos.reshape(-1), same.reshape(-1))
