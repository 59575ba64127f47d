"""splitReps — duplicate short repeat edges whose left/right neighbor
pairing is unambiguously resolved by read paths.

Behavioral equivalent of the reference's solveReps/solvable/split1edge
(src/splitReps.c:166-303, 419-505): an edge ``m`` with n in-arcs from
distinct lefts and n out-arcs to distinct rights (2 <= n <= 4) is split
into n copies when the read paths traverse it as a perfect matching —
each left continues into exactly one right and vice versa
(``gothrough[i][j]``, splitReps.c:272).  Each copy takes one (left,
right) pair's arcs; reads that crossed the repeat then concatenate
straight through instead of stopping at the branch.

The reference implementation walks per-edge marker linked lists
(cntByReads via edge markers loaded from ``.path``); here the read
evidence arrives as a flat (T, 3) array of consecutive edge triples
and the candidate scan is a vectorized filter over the COO arc table.
The graph surgery itself (a handful of row appends + arc moves per
split) runs on host numpy — candidates are rare by construction.

Note the reference v1.04 never calls solveReps in the Trans flow
(contig.c has no call site; legacy from SOAPdenovo-genome), so this is
a documented superset exposed behind our contig ``-R`` flag.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from . import arcs as arcs_mod
from . import unitigs

MAX_REP = 4  # reference solvable(): 2..4 branches (splitReps.c:188-199)


def path_triples(paths, file_to_row: np.ndarray) -> np.ndarray:
    """Consecutive (l, m, r) edge-row triples from read paths.

    ``paths``: iterable of 1-based .edge.gz file-id arrays (one per
    recorded read, as written by io.stagefiles.PathRecorder);
    ``file_to_row``: file id -> edge row.  Emits each triple in both
    orientations (a read on the twin strand is the mirrored twin
    triple — the reference gets this for free because markers live on
    both an edge and its twin, splitReps.c:99-124)."""
    out = []
    for p in paths:
        rows = file_to_row[np.asarray(p, np.int64)]
        if rows.shape[0] < 3 or np.any(rows < 0):
            continue
        tri = np.stack([rows[:-2], rows[1:-1], rows[2:]], axis=1)
        out.append(tri)
    if not out:
        return np.zeros((0, 3), np.int64)
    return np.concatenate(out, axis=0)


def _mirror(triples: np.ndarray, twin: np.ndarray) -> np.ndarray:
    """Append the twin-strand orientation of every triple."""
    if triples.shape[0] == 0:
        return triples
    t = np.asarray(triples, np.int64)
    ok = np.all((t >= 0) & (t < twin.shape[0]), axis=1)
    t = t[ok]
    rev = np.stack([twin[t[:, 2]], twin[t[:, 1]], twin[t[:, 0]]], axis=1)
    both = np.concatenate([t, rev], axis=0)
    return np.unique(both, axis=0)


def solve_reps(eg: unitigs.EdgeGraph, aset: arcs_mod.ArcSet,
               triples: np.ndarray
               ) -> Tuple[unitigs.EdgeGraph, arcs_mod.ArcSet, int]:
    """Split every solvable repeat edge; returns (edges, arcs, n_split).

    A solvable edge m (solvable(), splitReps.c:166-303):
      * has n distinct in-neighbors and n distinct out-neighbors,
        2 <= n <= MAX_REP, one arc per neighbor;
      * none of {m, lefts, rights} coincide or pair as twins
        (interferingCheck, splitReps.c:33-70);
      * the read-triple matrix gothrough[lefts x rights] is a perfect
        matching.
    Splitting (split1edge + cp1edge + moveArc2cp, splitReps.c:305-436):
    copy m (and its twin) n-1 times; copy i takes pair i's in/out arcs
    (and the twin's mirrored arcs); pair 0 stays on the original.
    """
    n_e = int(eg.n_edges)
    twin = np.asarray(eg.twin[:n_e]).astype(np.int64)
    deleted = np.asarray(eg.deleted[:n_e])

    n_a = int(aset.n)
    fr = np.asarray(aset.from_ed[:n_a]).astype(np.int64)
    to = np.asarray(aset.to_ed[:n_a]).astype(np.int64)
    mu = np.asarray(aset.mult[:n_a]).astype(np.int64)
    live = (fr >= 0) & (to >= 0) & (mu > 0)
    if n_e == 0 or not live.any():
        return eg, aset, 0
    fr, to, mu = fr[live], to[live], mu[live]

    out_deg = np.bincount(fr, minlength=n_e)
    in_deg = np.bincount(to, minlength=n_e)
    cand = np.nonzero(
        (out_deg >= 2) & (out_deg <= MAX_REP) & (in_deg == out_deg)
        & ~deleted)[0]
    if cand.size == 0:
        return eg, aset, 0

    trip = _mirror(triples, twin)
    trip_set = set(map(tuple, trip))

    # arc lookup: (from, to) -> multiplicity
    arc_mult = {}
    for f, t, m in zip(fr, to, mu):
        arc_mult[(int(f), int(t))] = arc_mult.get((int(f), int(t)), 0) + m
    outs = {}
    ins = {}
    for f, t in zip(fr, to):
        outs.setdefault(int(f), []).append(int(t))
        ins.setdefault(int(t), []).append(int(f))

    new_rows = []      # (src_row,) copies to append, per new edge row
    arc_del = set()    # (f, t) arcs to zero
    arc_add = []       # (f, t, mult) arcs to append
    n_split = 0
    nxt = n_e
    split_src = set()

    for m in cand:
        m = int(m)
        if m in split_src or int(twin[m]) in split_src:
            continue
        lefts = sorted(set(ins.get(m, [])))
        rights = sorted(set(outs.get(m, [])))
        n = len(lefts)
        if n != len(rights) or not (2 <= n <= MAX_REP):
            continue
        involved = [m] + lefts + rights
        inv_set = set(involved)
        if len(inv_set) != len(involved):
            continue  # interferingCheck: repeated participant
        if any(int(twin[e]) in inv_set for e in involved):
            continue  # a participant pairs with another's twin
        if any(e in split_src for e in involved):
            continue
        go = np.array([[1 if (l, m, r) in trip_set else 0
                        for r in rights] for l in lefts])
        if not (np.all(go.sum(1) == 1) and np.all(go.sum(0) == 1)):
            continue  # not a perfect matching -> unresolvable
        pairs = [(lefts[i], rights[int(np.argmax(go[i]))])
                 for i in range(n)]
        tm = int(twin[m])
        # pair 0 stays on m; pairs 1.. get fresh copies
        for (l, r) in pairs[1:]:
            cp, cp_t = nxt, (nxt if tm == m else nxt + 1)
            new_rows.append(m)
            if tm != m:
                new_rows.append(tm)
            nxt = cp_t + 1
            for (f, t, nf, nt) in ((l, m, l, cp), (m, r, cp, r)):
                arc_del.add((f, t))
                arc_add.append((nf, nt, arc_mult.get((f, t), 1)))
            # mirrored twin-strand arcs
            lt, rt = int(twin[l]), int(twin[r])
            for (f, t, nf, nt) in ((rt, tm, rt, cp_t), (tm, lt, cp_t, lt)):
                if (f, t) in arc_mult:
                    arc_del.add((f, t))
                    arc_add.append((nf, nt, arc_mult[(f, t)]))
        split_src.update((m, tm))
        n_split += 1

    if n_split == 0:
        return eg, aset, 0

    # --- append edge rows (cp1edge: seq/length/cvg shared with source)
    def _np(x):
        return np.asarray(x)

    add = np.array(new_rows, np.int64)
    n_new = nxt
    e_cap = max(eg.from_node.shape[0], n_new)

    def grow(field, fill):
        a = _np(field)
        out = np.full(e_cap, fill, a.dtype)
        out[:n_e] = a[:n_e]
        return out

    from_node = grow(eg.from_node, -1)
    to_node = grow(eg.to_node, -1)
    length = grow(eg.length, 0)
    cvg = grow(eg.cvg, 0)
    twin_f = grow(eg.twin, -1)
    seq_off = grow(eg.seq_off, 0)
    deleted_f = grow(eg.deleted, False)
    # each copy gets its OWN pool region (appended) — the concatenate
    # pass's per-base ownership map requires disjoint [off, off+len)
    # per live edge (contig_merge._merge's marks/cumsum rebuild)
    pool = _np(eg.seq_pool)
    segs = [pool]
    off_next = pool.shape[0]
    for i, src in enumerate(add):
        row = n_e + i
        from_node[row] = from_node[src]
        to_node[row] = to_node[src]
        length[row] = length[src]
        cvg[row] = cvg[src]
        ln = int(length[src])
        segs.append(pool[seq_off[src]:seq_off[src] + ln])
        seq_off[row] = off_next
        off_next += ln
        deleted_f[row] = False
    seq_pool = np.concatenate(segs) if len(segs) > 1 else pool
    # twin wiring: copies were appended (m, tm) adjacent; palindromes single
    i = 0
    while i < add.shape[0]:
        row = n_e + i
        src = int(add[i])
        if int(twin[src]) == src:
            twin_f[row] = row
            i += 1
        else:
            twin_f[row] = row + 1
            twin_f[row + 1] = row
            i += 2

    eg2 = unitigs.EdgeGraph(
        from_node=jnp.asarray(from_node), to_node=jnp.asarray(to_node),
        length=jnp.asarray(length), cvg=jnp.asarray(cvg),
        twin=jnp.asarray(twin_f), seq_off=jnp.asarray(seq_off),
        seq_pool=jnp.asarray(seq_pool),
        n_edges=jnp.asarray(n_new, jnp.int32),
        node_edge=eg.node_edge, node_pos=eg.node_pos,
        deleted=jnp.asarray(deleted_f))

    # --- rebuild the COO arc table
    keep = np.array([(int(f), int(t)) not in arc_del
                     for f, t in zip(fr, to)])
    f2 = np.concatenate([fr[keep], np.array([a[0] for a in arc_add],
                                            np.int64)])
    t2 = np.concatenate([to[keep], np.array([a[1] for a in arc_add],
                                            np.int64)])
    m2 = np.concatenate([mu[keep], np.array([a[2] for a in arc_add],
                                            np.int64)])
    a_cap = max(aset.from_ed.shape[0], f2.shape[0])
    pad = a_cap - f2.shape[0]
    aset2 = arcs_mod.ArcSet(
        from_ed=jnp.asarray(np.concatenate(
            [f2, np.full(pad, -1)]).astype(np.int32)),
        to_ed=jnp.asarray(np.concatenate(
            [t2, np.full(pad, -1)]).astype(np.int32)),
        mult=jnp.asarray(np.concatenate(
            [m2, np.zeros(pad)]).astype(np.int32)),
        n=jnp.asarray(f2.shape[0], jnp.int32))
    return eg2, aset2, n_split
