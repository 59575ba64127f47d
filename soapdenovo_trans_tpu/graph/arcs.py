"""Read -> edge-path threading and preArc accumulation.

TPU-native equivalent of prlRead2edge/parse1read (reference:
src/prlRead2path.c:617-789) and the arc symmetrization done at load
time by add1Arc (src/loadPreGraph.c:563-627).

The reference walks each read serially, building a compacted edge
path (consecutive interior k-mers of the same edge collapse; adjacent
vertex k-mers resolve through a (K+1)-mer "patch" table to length-1
edges), then records a preArc for every adjacent pair.  Here the same
compaction is computed data-parallel over a whole read batch:

* per k-mer position: one batched dictionary lookup -> directed node
  -> owning edge via the node->(edge,pos) map from condensation;
* per adjacent vertex pair: one batched (K+1)-mer patch lookup;
* "previous path entry" for every slot via a single cumulative-max
  scan instead of a serial append loop;
* missing/deleted k-mers become barriers that no arc may cross.

Deviation from the reference: a deleted k-mer mid-read *truncates*
the reference's walk (parse1read's break at :655); here it only
breaks adjacency at that point and threading resumes after.  This can
only add arcs the reference would drop from reads spanning deleted
k-mers.

preArcs are symmetrized like add1Arc: every observed (f, t, w) also
contributes (twin(t), twin(f), w); a self-twin arc therefore gets 2w,
matching the reference's special case.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import bits, dictionary
from . import unitigs


class PatchTable(NamedTuple):
    """Canonical (K+1)-mer -> length-1 edge (reference KmerSetsPatch,
    src/node2edge.c:419-462)."""

    keys: jnp.ndarray   # (Pcap, W1) uint32 sorted canonical (K+1)-mers
    edge: jnp.ndarray   # (Pcap,) int32 edge walked in canonical orientation
    n: jnp.ndarray


class ArcSet(NamedTuple):
    """COO preArc table: from-edge, to-edge, multiplicity — the flat
    replacement for the reference's per-edge preARC linked lists."""

    from_ed: jnp.ndarray  # (Acap,) int32
    to_ed: jnp.ndarray    # (Acap,) int32
    mult: jnp.ndarray     # (Acap,) int32
    n: jnp.ndarray


@functools.partial(jax.jit, static_argnums=(2,))
def _patch_candidates(eg: unitigs.EdgeGraph, table: dictionary.KmerTable,
                      k: int):
    e_cap = eg.length.shape[0]

    is_len1 = (eg.length == 1) & (jnp.arange(e_cap) < eg.n_edges)
    # from_node = 2*row + strand: gather the e_cap (small) key rows
    # FIRST and orient after — materializing a (2*cap, W) oriented
    # table to gather from compile-OOMs the chip at pow2 2^24 caps
    u = jnp.clip(eg.from_node, 0)
    km = table.keys[u >> 1]
    from_km = jnp.where(((u & 1) == 1)[:, None],
                        bits.reverse_complement(km, k), km)
    first_base = eg.seq_pool[jnp.clip(eg.seq_off, 0, eg.seq_pool.shape[0] - 1)]
    kp = bits.append_base(from_km, first_base.astype(jnp.uint32), k)
    can, use_rc = bits.canonical(kp, k + 1)
    w1 = can.shape[-1]
    sentinel = jnp.full((e_cap, w1), jnp.uint32(0xFFFFFFFF))
    can = jnp.where(is_len1[:, None], can, sentinel)
    val = jnp.where(use_rc, eg.twin, jnp.arange(e_cap, dtype=jnp.int32))
    val = jnp.where(is_len1, val, -1)
    n_len1 = jnp.sum(is_len1.astype(jnp.int32))
    return can, val, n_len1


def build_patch(eg: unitigs.EdgeGraph, table: dictionary.KmerTable,
                k: int) -> PatchTable:
    can, val, n_len1 = _patch_candidates(eg, table, k)
    skeys, sval = dictionary._sort_by_keys(can, val)
    n = int(n_len1)
    cap = dictionary.round_up(max(n, 1))
    return PatchTable(
        dictionary.fit_cap(skeys, cap, jnp.uint32(0xFFFFFFFF)),
        dictionary.fit_cap(sval, cap, -1), jnp.int32(n))


@functools.partial(jax.jit, static_argnums=(5,))
def thread_reads(seqs: jnp.ndarray, lengths: jnp.ndarray,
                 table: dictionary.KmerTable, eg: unitigs.EdgeGraph,
                 patch: PatchTable, k: int):
    """Thread a padded read batch through the edge graph.

    Returns flat arc candidates (from_ed, to_ed, valid) of shape
    (R * 2 * num_windows,): one potential arc per path slot.
    """
    from ..ops import kmer as kmer_mod

    r, l = seqs.shape
    p = l - k + 1  # kmer windows per read

    stream = kmer_mod.chop_reads(seqs, lengths, k)
    rows = dictionary.lookup(table.keys, stream.kmers)
    node_live = (rows >= 0) & ~_gather_or(table.deleted, rows, True)
    u = jnp.where(node_live, 2 * rows + stream.is_rc.astype(jnp.int32), -1)
    eid = _gather_or(eg.node_edge, u, -1)
    eid = jnp.where(stream.valid & node_live, eid, -1)

    interior = (eid >= 0).reshape(r, p)
    vertexish = (stream.valid & node_live & (eid < 0)).reshape(r, p)
    # Any in-read window that does not resolve to a live node breaks
    # the path: deleted/missing kmers AND N-containing windows (the
    # reference's InvalidKmer lookups fail the same way).
    in_read = (jnp.arange(p)[None, :] + k) <= lengths[:, None]
    barrier = in_read & ~(stream.valid & node_live).reshape(r, p)
    eid = eid.reshape(r, p)

    # (K+1)-mer patch lookups for adjacent vertex pairs
    stream1 = kmer_mod.chop_reads(seqs, lengths, k + 1)
    prow = dictionary.lookup(patch.keys, stream1.kmers)
    pedge = _gather_or(patch.edge, prow, -1)
    pedge = jnp.where(
        (pedge >= 0) & stream1.is_rc,
        _gather_or(eg.twin, jnp.clip(pedge, 0), -1), pedge)
    pedge = jnp.where(stream1.valid, pedge, -1).reshape(r, p - 1)
    pair_ok = vertexish[:, :-1] & vertexish[:, 1:] & (pedge >= 0)
    pair_eid = jnp.where(pair_ok, pedge, -1)

    # interior entry only where a new traversal starts (dedup runs)
    prev_same = jnp.concatenate(
        [jnp.zeros((r, 1), bool),
         interior[:, :-1] & (eid[:, :-1] == eid[:, 1:])], axis=1)
    is_entry_pos = interior & ~prev_same
    return _path_slots(jnp.where(is_entry_pos, eid, -1), pair_eid,
                       barrier)


_LVS_SENT = jnp.int32(-(2**31) + 1)


def _last_value_scan(flag, value):
    """Inclusive 'last value where flag' scan (1-D): replaces a
    prev-slot gather with an associative carry — gathers compile (and
    run) poorly on this backend, scans are cheap."""
    marked = jnp.where(flag, value, _LVS_SENT)
    return jax.lax.associative_scan(
        lambda a, b: jnp.where(b == _LVS_SENT, a, b), marked)


@jax.jit
def _path_slots(pos_e, pair_e, barrier):
    """Path-slot adjacency, flat over all r*2p slots.

    Even slot 2j = position entry, odd slot 2j+1 = (K+1)-mer pair
    entry.  The whole pass is elementwise + three 1-D scans — NO
    strided scatters, per-row scans, or take_along_axis gathers: those
    are what made the earlier (r, 2p) formulation compile superlinearly
    in r on the TPU backend (>35 min at 32768 rows, VERDICT r4 #3).
    Cross-read carries are masked off with a same-read guard instead of
    restarting the scans per row."""
    r, p = pos_e.shape
    two_p = 2 * p
    pair_full = jnp.concatenate(
        [pair_e, jnp.full((r, 1), -1, jnp.int32)], axis=1)
    # interleave via stack+reshape (transpose), not .at[:, 0::2].set
    slots_e = jnp.stack([pos_e, pair_full], axis=-1).reshape(r, two_p)
    slots_bar = jnp.stack(
        [barrier, jnp.zeros((r, p), bool)], axis=-1).reshape(r, two_p)

    flat_e = slots_e.reshape(-1)
    flat_bar = slots_bar.reshape(-1)
    n = r * two_p
    s = jnp.arange(n, dtype=jnp.int32)
    entry = flat_e >= 0

    def shift1(x, fill):
        return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])

    prev_slot = shift1(
        jax.lax.associative_scan(jnp.maximum, jnp.where(entry, s, -1)),
        jnp.int32(-1))
    prev_val = shift1(_last_value_scan(entry, flat_e), _LVS_SENT)
    bar_prefix = jnp.cumsum(flat_bar.astype(jnp.int32))
    bar_at_prev = shift1(_last_value_scan(entry, bar_prefix), _LVS_SENT)

    read_start = jnp.repeat(
        jnp.arange(r, dtype=jnp.int32) * two_p, two_p,
        total_repeat_length=n)
    prev_ok = entry & (prev_slot >= read_start)
    # no barrier in (prev_slot, this_slot]; prefix differences within
    # one read are row-local even though the cumsum is global
    clean = (bar_prefix - bar_at_prev) == 0
    # An arc joins every adjacent entry pair — including A->A from a
    # read that leaves and re-enters the same edge (the reference does
    # the same: prlRead2path.c:200-236 adds arcs for all adjacent
    # nonzero mix entries; only runs of interior kmers collapse).
    arc_valid = prev_ok & clean
    return prev_val, flat_e, arc_valid


def _gather_or(x, idx, fill):
    safe = jnp.clip(idx, 0, x.shape[0] - 1)
    return jnp.where((idx >= 0) & (idx < x.shape[0]), x[safe], fill)


@jax.jit
def _count_device(from_ed, to_ed, valid, twin):
    """Symmetrize (add1Arc semantics) then sort+segment-count."""
    f = jnp.where(valid, from_ed, jnp.int32(2**30))
    t = jnp.where(valid, to_ed, jnp.int32(2**30))
    tw_f = _gather_or(twin, from_ed, 2**30)
    tw_t = _gather_or(twin, to_ed, 2**30)
    bf = jnp.where(valid, tw_t, jnp.int32(2**30))
    bt = jnp.where(valid, tw_f, jnp.int32(2**30))
    allf = jnp.concatenate([f, bf])
    allt = jnp.concatenate([t, bt])
    sf, st = jax.lax.sort((allf, allt), num_keys=2)
    n_tot = sf.shape[0]
    is_real = sf < 2**30
    first = jnp.concatenate(
        [jnp.ones(1, bool), (sf[1:] != sf[:-1]) | (st[1:] != st[:-1])])
    first = first & is_real
    seg = jnp.clip(jnp.cumsum(first.astype(jnp.int32)) - 1, 0, n_tot - 1)
    mult = jax.ops.segment_sum(
        is_real.astype(jnp.int32), seg, num_segments=n_tot)
    n_arcs = jnp.sum(first.astype(jnp.int32))
    uf = jnp.full(n_tot, -1, jnp.int32).at[
        jnp.where(first, seg, n_tot)].set(sf, mode="drop")
    ut = jnp.full(n_tot, -1, jnp.int32).at[
        jnp.where(first, seg, n_tot)].set(st, mode="drop")
    return uf, ut, mult, n_arcs


def count_arcs_many(cands, twin) -> ArcSet:
    """count_arcs over SEVERAL thread_reads outputs at once.

    The read-threading loop dispatches one fixed-shape thread_reads
    per chunk; folding each chunk's candidates through count_arcs
    costs one host sync (int(n)) per chunk, which serializes the
    dispatch pipeline through the tunnel.  Concatenating G chunks and
    counting once cuts the sync count Gx (the concat sort is one
    bigger sort — sorts are the fast primitive here, ROOFLINE.md)."""
    f = jnp.concatenate([c[0] for c in cands])
    t = jnp.concatenate([c[1] for c in cands])
    v = jnp.concatenate([c[2] for c in cands])
    return count_arcs(f, t, v, twin)


def count_arcs(from_ed, to_ed, valid, twin) -> ArcSet:
    """Host-orchestrated arc dedup/count (sizes read once)."""
    uf, ut, mult, n_arcs = _count_device(from_ed, to_ed, valid, twin)
    n = int(n_arcs)
    cap = dictionary.round_up(max(n, 1))
    live = jnp.arange(cap) < n
    return ArcSet(
        jnp.where(live, dictionary.fit_cap(uf, cap, -1), -1),
        jnp.where(live, dictionary.fit_cap(ut, cap, -1), -1),
        jnp.where(live, dictionary.fit_cap(mult, cap, 0), 0),
        jnp.int32(n))


class ArcForest:
    """Binary-counter accumulation of per-batch ArcSets.

    A linear ``merge_arcs(acc, batch)`` re-sorts the whole accumulator
    every read batch — quadratic in stream length (the same failure
    mode the counting LSM fixes for k-mer rows).  Equal-rank sets
    merge pairwise so each arc is re-sorted O(log n_batches) times."""

    def __init__(self, twin):
        self.twin = twin
        self.levels: list = []

    def insert(self, aset: ArcSet) -> None:
        i = 0
        while True:
            if i == len(self.levels):
                self.levels.append(aset)
                return
            if self.levels[i] is None:
                self.levels[i] = aset
                return
            aset = merge_arcs(self.levels[i], aset, self.twin)
            self.levels[i] = None
            i += 1

    def finish(self) -> "ArcSet | None":
        out = None
        for t in self.levels:
            if t is None:
                continue
            out = t if out is None else merge_arcs(out, t, self.twin)
        return out


def merge_arcs(a: ArcSet, b: ArcSet, twin) -> ArcSet:
    """Combine arc sets from two read batches (already symmetrized:
    merge must NOT re-symmetrize, just re-sort and add)."""
    f = jnp.concatenate([a.from_ed, b.from_ed])
    t = jnp.concatenate([a.to_ed, b.to_ed])
    m = jnp.concatenate([a.mult, b.mult])
    valid = f >= 0
    f = jnp.where(valid, f, 2**30)
    t = jnp.where(valid, t, 2**30)
    sf, st, sm = jax.lax.sort((f, t, m), num_keys=2)
    n_tot = sf.shape[0]
    is_real = sf < 2**30
    first = jnp.concatenate(
        [jnp.ones(1, bool), (sf[1:] != sf[:-1]) | (st[1:] != st[:-1])])
    first = first & is_real
    seg = jnp.clip(jnp.cumsum(first.astype(jnp.int32)) - 1, 0, n_tot - 1)
    mult = jax.ops.segment_sum(
        jnp.where(is_real, sm, 0), seg, num_segments=n_tot)
    n = int(jnp.sum(first.astype(jnp.int32)))
    uf = jnp.full(n_tot, -1, jnp.int32).at[
        jnp.where(first, seg, n_tot)].set(sf, mode="drop")
    ut = jnp.full(n_tot, -1, jnp.int32).at[
        jnp.where(first, seg, n_tot)].set(st, mode="drop")
    cap = dictionary.round_up(max(n, 1))
    live = jnp.arange(cap) < n
    return ArcSet(
        jnp.where(live, dictionary.fit_cap(uf, cap, -1), -1),
        jnp.where(live, dictionary.fit_cap(ut, cap, -1), -1),
        jnp.where(live, dictionary.fit_cap(mult, cap, 0), 0),
        jnp.int32(n))
