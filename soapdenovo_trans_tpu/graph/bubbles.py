"""Bubble pinching — parallel reformulation of Velvet's Tour-Bus.

Reference: bubblePinch (src/bubble.c:2048-2135) runs a
coverage-weighted Dijkstra from every edge (DFibHeap, time =
length/multiplicity), detects re-converging paths (comparePaths
:1766), aligns them with a banded Needleman-Wunsch (compareSequences
:425-497, >=90% identity, length difference bounded by DIFF), and
merges the minority path onto the majority (cleanUpRedundancy :1617).

TPU-native reformulation: after condensation, a bubble's two branches
are PARALLEL EDGES of the unitig graph (same from-vertex, same
to-vertex) — the SNP/sequencing-error case the pass exists for.  One
sort groups all parallel-edge families; every candidate pair aligns
in a single vmapped NW; minorities merge into the majority in one
shot.  Multi-edge-path bubbles (MAXNODELENGTH 3/9/30 by -M) collapse
over the contig stage's clean->concatenate->pinch iterations as their
segments merge into single edges.

-M levels (bubble.c:2072-2086): M<=1 -> DIFF 2, M==2 -> DIFF 3,
M>=3 -> DIFF 10; identity threshold 0.9 throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dictionary
from . import arcs as arcs_mod
from . import unitigs

MAX_TAIL = 128  # longest branch tail considered (covers SNP bubbles)


def _diff_for(merge_level: int) -> int:
    if merge_level <= 1:
        return 2
    if merge_level == 2:
        return 3
    return 10


def _gather_or(x, idx, fill):
    safe = jnp.clip(idx, 0, x.shape[0] - 1)
    return jnp.where((idx >= 0) & (idx < x.shape[0]), x[safe], fill)


@jax.jit
def _find_pairs(eg: unitigs.EdgeGraph):
    """Group edges by (from_node, to_node); return for each edge the
    group's max-coverage representative (the majority branch)."""
    e_cap = eg.length.shape[0]
    live = (jnp.arange(e_cap) < eg.n_edges) & ~eg.deleted & \
        (eg.from_node >= 0) & (eg.to_node >= 0)
    BIG = jnp.int32(2**30)
    fk = jnp.where(live, eg.from_node, BIG)
    tk = jnp.where(live, eg.to_node, BIG)
    # sort by (from, to, -cvg): each group's first row is its
    # highest-coverage member — the majority branch
    sf, st, _, sid = jax.lax.sort(
        (fk, tk, -eg.cvg, jnp.arange(e_cap, dtype=jnp.int32)), num_keys=3)
    first = jnp.concatenate(
        [jnp.ones(1, bool), (sf[1:] != sf[:-1]) | (st[1:] != st[:-1])])
    grp = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg_head = jax.ops.segment_max(
        jnp.where(first, sid, -1), grp, num_segments=e_cap)
    maj_sorted = seg_head[jnp.clip(grp, 0, e_cap - 1)]
    maj = jnp.full(e_cap, -1, jnp.int32).at[sid].set(
        jnp.where(sf < BIG, maj_sorted, -1))
    return maj, live


def _lcs_scores(a, b, la, lb):
    """LCS length between a[:la] and b[:lb] per batch row — the
    identity measure for compareSequences' F-matrix check
    (bubble.c:425-497): matches / max(len) >= 0.9 accepts."""
    p = a.shape[0]
    # mask pads with distinct sentinels so they never match
    ar = jnp.where(jnp.arange(MAX_TAIL)[None, :] < la[:, None], a, 254)
    br = jnp.where(jnp.arange(MAX_TAIL)[None, :] < lb[:, None], b, 255)

    def row_step(prev, i):
        ai = ar[:, i][:, None]
        match = (ai == br).astype(jnp.int32)
        cand = prev[:, :-1] + match
        upper = jnp.maximum(cand, prev[:, 1:])
        # running prefix max along j (gap in b)
        run = jax.lax.associative_scan(jnp.maximum, upper, axis=1)
        new = jnp.concatenate([jnp.zeros((p, 1), jnp.int32), run], axis=1)
        return new, None

    init = jnp.zeros((p, MAX_TAIL + 1), jnp.int32)
    final, _ = jax.lax.scan(row_step, init, jnp.arange(MAX_TAIL))
    return final[:, -1]


@functools.partial(jax.jit, static_argnums=(2,))
def _pinch_device(eg: unitigs.EdgeGraph, aset: arcs_mod.ArcSet,
                  diff: int):
    e_cap = eg.length.shape[0]
    maj, live = _find_pairs(eg)
    me = jnp.arange(e_cap, dtype=jnp.int32)
    cand = live & (maj >= 0) & (maj != me)
    # structural bounds (comparePaths length window)
    lm = _gather_or(eg.length, maj, 0)
    cand &= jnp.abs(eg.length - lm) <= diff
    cand &= (eg.length <= MAX_TAIL) & (lm <= MAX_TAIL)
    # do not merge an edge into its own twin (palindrome guard)
    cand &= maj != eg.twin

    # gather tails into fixed-size buffers
    s_pool = eg.seq_pool.shape[0]
    base_idx = jnp.arange(MAX_TAIL)

    def tail_of(e):
        off = _gather_or(eg.seq_off, e, 0)
        take = jnp.clip(off[:, None] + base_idx[None, :], 0, s_pool - 1)
        return eg.seq_pool[take]

    a = tail_of(me)
    b = tail_of(jnp.clip(maj, 0))
    la = jnp.where(cand, eg.length, 0)
    lb = jnp.where(cand, lm, 0)
    lcs = _lcs_scores(a, b, la, lb)
    mx = jnp.maximum(la, lb)
    ok = cand & (lcs * 10 >= mx * 9)  # >= 90% identity
    # twin-consistency: merge pairs only when both twins agree
    ok &= _gather_or(ok, eg.twin, False) | (eg.twin == me)

    # merge: minority deleted, coverage added to majority
    add_cvg = jnp.zeros(e_cap, jnp.int32).at[
        jnp.where(ok, maj, e_cap)].add(
            jnp.where(ok, eg.cvg, 0), mode="drop")
    new_cvg = jnp.clip(eg.cvg + add_cvg, 0, unitigs.MAX_EDGE_COV)
    new_deleted = eg.deleted | ok
    n_merged = jnp.sum(ok.astype(jnp.int32))

    # reroute minority arcs onto the majority
    remap = jnp.where(ok, maj, me)
    new_f = jnp.where(aset.from_ed >= 0,
                      _gather_or(remap, aset.from_ed, -1), -1)
    new_t = jnp.where(aset.to_ed >= 0,
                      _gather_or(remap, aset.to_ed, -1), -1)
    return new_cvg, new_deleted, new_f, new_t, n_merged


def bubble_pinch(eg: unitigs.EdgeGraph, aset: arcs_mod.ArcSet,
                 table, k: int, merge_level: int):
    """Full Tour-Bus when the native pass is available (multi-node
    paths, MAXNODELENGTH 3/9/30 by -M, NW identity — bubble.c
    semantics; see csrc/tourbus.cpp); otherwise the vectorized
    parallel-edge pinch below (SNP/error bubbles only)."""
    if merge_level <= 0:
        return eg, aset
    from . import tourbus
    if tourbus.available():
        eg, aset, stats = tourbus.pinch(eg, aset, k, merge_level)
        print(f"[bubbles] tourbus: {stats['backtracked']} pairs found, "
              f"{stats['compared']} compared, {stats['merged']} merged")
        return eg, aset
    return _parallel_edge_pinch(eg, aset, table, k, merge_level)


def _parallel_edge_pinch(eg: unitigs.EdgeGraph, aset: arcs_mod.ArcSet,
                         table, k: int, merge_level: int):
    """Iterate pinching to fixpoint (the reference's tourBus loop
    revisits until no merges remain, bubble.c:2123)."""
    diff = _diff_for(merge_level)
    total = 0
    for _ in range(8):
        new_cvg, new_deleted, new_f, new_t, n_merged = _pinch_device(
            eg, aset, diff)
        n = int(n_merged)
        if n == 0:
            break
        total += n
        eg = eg._replace(cvg=new_cvg, deleted=new_deleted)
        aset = arcs_mod.merge_arcs(
            arcs_mod.ArcSet(new_f, new_t, aset.mult, jnp.int32(0)),
            arcs_mod.ArcSet(jnp.full(1, -1, jnp.int32),
                            jnp.full(1, -1, jnp.int32),
                            jnp.zeros(1, jnp.int32), jnp.int32(0)),
            eg.twin)
    print(f"[bubbles] {total} bubble branches merged")
    return eg, aset
