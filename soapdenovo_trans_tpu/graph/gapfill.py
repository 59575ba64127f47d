"""Batched local gap assembly (-F): the TPU-native localAsm.

Reference: src/localAsm.c (readsInGap2DBgraph :321, searchFgap :739,
traceAlongDBgraph :564) driven by prlReadFillGap.c (check1scaf :707,
fill1scaf :739).  The reference fills each scaffold gap by building a
tiny k-mer graph from the reads assigned to that gap plus the two
flanking contig ends, then DFS-walking from the left flank's tail
k-mer to the right flank's head k-mer inside a distance window, with
repeat masking (trace4Repeat :1052-1261) and tandem masking
(kmerSet_markTandem :1603) to keep the DFS from cycling, and a
single-read fallback when the graph walk fails (readsCrossGap :2035).

TPU-native reformulation: all gaps are assembled simultaneously.

* One global `chop_reads` over the (gap, read) batch; each k-mer is
  tagged with its gap id.
* One sort of (gap_id, kmer) builds every per-gap k-mer table at once
  (gap id is the leading key word, so each gap's slice is contiguous
  and a single global binary search answers per-gap lookups).
* The walk is a bounded-window SHORTEST PATH, not a DFS: every table
  row becomes two directed nodes (canonical row x orientation, like
  graph/dbg.py), one batched lookup resolves all successors, and two
  lock-step BFS waves (forward from each gap's start k-mer, forward
  from the twin of its target = backward from the target) give
  distance-from-start and distance-to-target for every node at once.
  A gap is accepted when the start->target distance lands in the gap
  window; the sequence is traced by descending distance-to-target
  (coverage breaks ties).  BFS never revisits a node, so the
  reference's repeat/tandem masking is subsumed: cycles are simply
  never taken, and branch decoys cannot trap the walk the way they
  trap greedy extension.
* readsCrossGap fallback: a single gap read anchored by exact K-mers
  on both flank ends bridges gaps the graph walk cannot
  (localAsm.c:2035).

Negative/overlap gaps are handled separately on the host by direct
flank overlap matching (reference procGap/contigCatch,
prlReadFillGap.c:272,1008).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bits, kmer

MAX_MISMATCH_PCT = 10  # overlap-merge tolerance (contigCatch allows ~10%)


class LocalTables(NamedTuple):
    """All per-gap k-mer tables in one sorted array.

    keys: (cap, 1+W) uint32 — [gap_id, kmer...] ascending; sentinel
    rows are all-ones.  count: (cap,) int32 occurrences.
    """

    keys: jnp.ndarray
    count: jnp.ndarray


def _lex_less(a, b):
    """Row-wise lexicographic a < b over trailing word axis."""
    w = a.shape[-1]
    lt = jnp.zeros(a.shape[:-1], bool)
    decided = jnp.zeros(a.shape[:-1], bool)
    for i in range(w):
        lt = jnp.where(~decided & (a[..., i] < b[..., i]), True, lt)
        decided = decided | (a[..., i] != b[..., i])
    return lt


@functools.partial(jax.jit, static_argnums=(3,))
def build_local_tables(gap_id, kmers, valid, cap_pow2: int
                       ) -> LocalTables:
    """Sort (gap_id, kmer) pairs, dedup, count.  Invalid rows sort to
    the sentinel block at the end."""
    n, w = kmers.shape
    keys = jnp.concatenate(
        [gap_id.astype(jnp.uint32)[:, None], kmers], axis=-1)
    keys = jnp.where(valid[:, None], keys, jnp.uint32(0xFFFFFFFF))
    res = jax.lax.sort(tuple(keys[:, i] for i in range(w + 1)),
                       num_keys=w + 1)
    skeys = jnp.stack(res, axis=-1)
    svalid = ~jnp.all(skeys == jnp.uint32(0xFFFFFFFF), axis=-1)
    first = jnp.concatenate(
        [jnp.ones(1, bool), jnp.any(skeys[1:] != skeys[:-1], axis=-1)])
    first &= svalid
    idx = jnp.arange(n, dtype=jnp.int32)
    (hidx,) = jax.lax.sort((jnp.where(first, idx, n),), num_keys=1)
    nxt = jnp.concatenate([hidx[1:], jnp.full(1, n, jnp.int32)])
    n_valid = jnp.sum(svalid.astype(jnp.int32))
    count = jnp.maximum(jnp.minimum(nxt, n_valid) - hidx, 0)
    live = hidx < n
    ukeys = jnp.where(live[:, None], skeys[jnp.clip(hidx, 0, n - 1)],
                      jnp.uint32(0xFFFFFFFF))
    return LocalTables(ukeys[:cap_pow2] if cap_pow2 <= n else
                       jnp.concatenate([
                           ukeys,
                           jnp.full((cap_pow2 - n, w + 1),
                                    jnp.uint32(0xFFFFFFFF))]),
                       count[:cap_pow2] if cap_pow2 <= n else
                       jnp.concatenate([
                           count, jnp.zeros(cap_pow2 - n, jnp.int32)]))


def _lookup_counts(tables: LocalTables, queries: jnp.ndarray
                   ) -> jnp.ndarray:
    """(M, 1+W) queries -> (M,) count (0 when absent)."""
    cap = tables.keys.shape[0]
    m = queries.shape[0]
    steps = max(cap.bit_length(), 1)
    lo = jnp.zeros(m, jnp.int32)
    hi = jnp.full(m, cap, jnp.int32)

    def step(_, carry):
        lo, hi = carry
        live = lo < hi
        mid = (lo + hi) >> 1
        row = tables.keys[jnp.clip(mid, 0, cap - 1)]
        less = _lex_less(row, queries)
        return (jnp.where(live & less, mid + 1, lo),
                jnp.where(live & ~less, mid, hi))

    lo, _ = jax.lax.fori_loop(0, steps, step, (lo, hi))
    g = jnp.clip(lo, 0, cap - 1)
    hit = (lo < cap) & jnp.all(tables.keys[g] == queries, axis=-1)
    return jnp.where(hit, tables.count[g], 0)


def _lookup_rows(tables: LocalTables, queries: jnp.ndarray
                 ) -> jnp.ndarray:
    """(M, 1+W) queries -> (M,) table row index or -1."""
    cap = tables.keys.shape[0]
    m = queries.shape[0]
    steps = max(cap.bit_length(), 1)
    lo = jnp.zeros(m, jnp.int32)
    hi = jnp.full(m, cap, jnp.int32)

    def step(_, carry):
        lo, hi = carry
        live = lo < hi
        mid = (lo + hi) >> 1
        row = tables.keys[jnp.clip(mid, 0, cap - 1)]
        less = _lex_less(row, queries)
        return (jnp.where(live & less, mid + 1, lo),
                jnp.where(live & ~less, mid, hi))

    lo, _ = jax.lax.fori_loop(0, steps, step, (lo, hi))
    g = jnp.clip(lo, 0, cap - 1)
    hit = (lo < cap) & jnp.all(tables.keys[g] == queries, axis=-1)
    return jnp.where(hit, lo, -1)


@functools.partial(jax.jit, static_argnums=(1,))
def _local_graph(tables: LocalTables, k: int):
    """Directed successor grid over the batched tables: table row r
    yields directed nodes u = 2r (canonical fwd) and 2r+1 (revcomp).
    Returns (succ (2cap, 4) int32 directed node or -1,
             ncount (2cap, 4) int32 successor-row occurrence count).
    Lookups are gap-scoped (the gap id is the leading key word), so
    no edge crosses gaps."""
    cap = tables.keys.shape[0]
    gap_word = tables.keys[:, :1]
    keys = tables.keys[:, 1:]
    w = keys.shape[-1]
    rc = bits.reverse_complement(keys, k)
    oriented = jnp.stack([keys, rc], axis=1).reshape(2 * cap, w)
    base4 = jnp.arange(4, dtype=jnp.uint32)
    ext = bits.next_kmer(
        jnp.broadcast_to(oriented[:, None, :], (2 * cap, 4, w)),
        jnp.broadcast_to(base4, (2 * cap, 4)), k)
    can, use_rc = bits.canonical(ext.reshape(-1, w), k)
    gq = jnp.repeat(gap_word, 8, axis=0)   # (2cap*4, 1)
    q = jnp.concatenate([gq, can], axis=-1)
    rows = _lookup_rows(tables, q)
    succ = jnp.where(rows >= 0,
                     2 * rows + use_rc.astype(jnp.int32), -1)
    ncount = jnp.where(rows >= 0,
                       tables.count[jnp.clip(rows, 0)], 0)
    return succ.reshape(2 * cap, 4), ncount.reshape(2 * cap, 4)


@functools.partial(jax.jit, static_argnums=(2,))
def _bfs(succ, start_nodes, max_steps: int):
    """Lock-step BFS over the directed grid: dist (2cap,) int32 from
    the given start nodes (-1 start = inactive gap), -1 unreachable.
    All gaps advance together; edges never cross gaps."""
    n = succ.shape[0]
    dist = jnp.full(n, -1, jnp.int32)
    dist = dist.at[jnp.where(start_nodes >= 0, start_nodes, n)].set(
        0, mode="drop")

    def body(t, dist):
        cur = dist == t
        idx = jnp.where(cur[:, None] & (succ >= 0), succ, n)
        nxt = jnp.zeros(n + 1, bool).at[idx.reshape(-1)].set(
            True, mode="drop")[:n]
        return jnp.where(nxt & (dist < 0), t + 1, dist)

    return jax.lax.fori_loop(0, max_steps, body, dist)


@functools.partial(jax.jit, static_argnums=(5,))
def _trace(succ, ncount, dist_to_target, start_nodes, target_nodes,
           max_steps: int):
    """Per gap, walk from start following strictly decreasing
    distance-to-target (coverage breaks ties).  Returns
    (bases (max_steps, G) uint8, ok (G,) bool)."""
    n = succ.shape[0]

    def g1(x, idx, fill):
        return jnp.where(idx >= 0, x[jnp.clip(idx, 0, n - 1)], fill)

    def step_fn(carry, _):
        cur, done = carry
        d = g1(dist_to_target, cur, -1)
        vs = succ[jnp.clip(cur, 0, n - 1)]          # (G, 4)
        dv = jnp.where(vs >= 0,
                       dist_to_target[jnp.clip(vs, 0, n - 1)], -1)
        ok_b = (dv == d[:, None] - 1) & (dv >= 0)
        score = jnp.where(ok_b, ncount[jnp.clip(cur, 0, n - 1)], -1)
        best = jnp.argmax(score, axis=-1)
        has = jnp.max(score, axis=-1) > -1
        nxt = jnp.take_along_axis(vs, best[:, None], axis=-1)[:, 0]
        emit = jnp.where(done | ~has, jnp.uint8(255),
                         best.astype(jnp.uint8))
        cur = jnp.where(done | ~has, cur, nxt)
        done = done | ~has | (cur == target_nodes)
        return (cur, done), emit

    init = (start_nodes, start_nodes == target_nodes)
    (cur, done), bases = jax.lax.scan(step_fn, init, None,
                                      length=max_steps)
    return bases, cur == target_nodes


def try_overlap_merge(left: str, right: str, gap: int,
                      max_overlap: int = 200) -> Optional[int]:
    """Negative/zero gap: find an overlap ov such that the last ov
    bases of `left` match the first ov bases of `right` within 10%
    mismatches (reference contigCatch, prlReadFillGap.c:1008).
    Returns ov or None."""
    want = -gap if gap < 0 else 0
    cands = sorted(range(1, min(max_overlap, len(left), len(right)) + 1),
                   key=lambda ov: abs(ov - want))
    for ov in cands:
        a, b = left[-ov:], right[:ov]
        mism = sum(1 for x, y in zip(a, b) if x != y)
        if mism * 100 <= ov * MAX_MISMATCH_PCT:
            return ov
    return None


class GapFillResult(NamedTuple):
    filled: np.ndarray     # (G,) bool
    fill_seq: List[str]    # per gap: inserted sequence ('' when
                           # overlap-merged); meaningful iff filled
    overlap: np.ndarray    # (G,) int32 bases of right contig start
                           # already covered (for splicing)


def fill_gaps(junctions: List[Tuple[str, str, int]],
              gap_reads: List[np.ndarray], k: int,
              max_steps: int = 0,
              tol: int = 50) -> GapFillResult:
    """Assemble every junction gap.

    junctions: (left_seq, right_seq, gap_estimate) per gap — the full
    contig sequences adjoining the gap.  gap_reads: per gap, an
    (n_i, L) uint8 code matrix of the reads assigned to the gap
    (see stages/scaff gap-read routing).  tol = -G GLDiff
    (reference global.h: GLDiff default 50).
    """
    g_n = len(junctions)
    if g_n == 0:
        return GapFillResult(np.zeros(0, bool), [], np.zeros(0, np.int32))
    w = bits.words_for_k(k)
    max_gap = max((j[2] for j in junctions), default=0)
    if max_steps <= 0:
        max_steps = int(min(max(2 * k + 2 * max(max_gap, 0) + 8, 64),
                            2048))

    # --- host: negative/zero gaps first (overlap merge) ---
    filled = np.zeros(g_n, bool)
    fill_seq = [""] * g_n
    overlap = np.zeros(g_n, np.int32)
    need_asm = []
    for gi, (left, right, gap) in enumerate(junctions):
        if gap <= 0:
            ov = try_overlap_merge(left, right, gap)
            if ov is not None:
                filled[gi] = True
                overlap[gi] = ov
                continue
        if len(left) >= k and len(right) >= k:
            need_asm.append(gi)
    if not need_asm:
        return GapFillResult(filled, fill_seq, overlap)

    # --- device: batched local assembly for the rest ---
    flank = 2 * k
    read_rows, read_gid = [], []
    for slot, gi in enumerate(need_asm):
        left, right, _ = junctions[gi]
        rows = [bits.encode_seq(left[-min(len(left), flank + k):]),
                bits.encode_seq(right[:min(len(right), flank + k)])]
        rds = gap_reads[gi] if gi < len(gap_reads) else None
        if rds is not None and len(rds):
            rows.extend(np.asarray(rds, np.uint8))
        for rw in rows:
            read_rows.append(np.asarray(rw, np.uint8))
            read_gid.append(slot)
    lmax = max(len(r) for r in read_rows)
    lmax = max(lmax, k)
    codes = np.full((len(read_rows), lmax), 4, np.uint8)
    lens = np.zeros(len(read_rows), np.int32)
    for i, rw in enumerate(read_rows):
        codes[i, : len(rw)] = rw
        lens[i] = len(rw)

    stream = kmer.chop_reads(jnp.asarray(codes), jnp.asarray(lens), k)
    rp = lmax - k + 1
    gid_of_row = jnp.asarray(np.asarray(read_gid, np.int32))
    kgid = jnp.repeat(gid_of_row, rp)
    n_rows = stream.kmers.shape[0]
    cap = 1 << max(int(n_rows - 1).bit_length(), 7)
    tables = build_local_tables(kgid, stream.kmers, stream.valid, cap)
    succ, ncount = _local_graph(tables, k)

    g_slots = len(need_asm)
    start = np.zeros((g_slots, w), np.uint32)
    target = np.zeros((g_slots, w), np.uint32)
    for slot, gi in enumerate(need_asm):
        left, right, _ = junctions[gi]
        start[slot] = bits.kmer_from_string(left[-k:])[:w]
        target[slot] = bits.kmer_from_string(right[:k])[:w]
    gap_ids = jnp.arange(g_slots, dtype=jnp.uint32)[:, None]

    def node_of(kmers_np):
        can, use_rc = bits.canonical(jnp.asarray(kmers_np), k)
        rows = _lookup_rows(
            tables, jnp.concatenate([gap_ids, can], axis=-1))
        return jnp.where(rows >= 0,
                         2 * rows + use_rc.astype(jnp.int32), -1)

    node_s = node_of(start)
    node_t = node_of(target)
    ds = _bfs(succ, node_s, max_steps)
    # dist-to-target = dist from twin(target) over the same graph,
    # read at the twin node (standard DBG duality)
    dt_twin = _bfs(succ, jnp.where(node_t >= 0, node_t ^ 1, -1),
                   max_steps)
    two_cap = succ.shape[0]
    dt = dt_twin.reshape(two_cap // 2, 2)[:, ::-1].reshape(two_cap)
    l0 = np.asarray(
        jnp.where(node_t >= 0,
                  ds[jnp.clip(node_t, 0)], -1))  # shortest walk length
    bases, traced_ok = _trace(succ, ncount, jnp.asarray(dt), node_s,
                              node_t, max_steps)
    bases = np.asarray(bases)      # (max_steps, slots)
    traced_ok = np.asarray(traced_ok)

    for slot, gi in enumerate(need_asm):
        length = int(l0[slot])
        gap = junctions[gi][2]
        ins_len = length - k
        if length < 0 or not traced_ok[slot] or \
                abs(max(ins_len, -k) - gap) > tol + k:
            continue  # unreachable or outside the distance window
        filled[gi] = True
        if ins_len >= 0:
            fill_seq[gi] = "".join("ACTG"[b] for b in bases[:ins_len, slot])
        else:
            overlap[gi] = -ins_len  # walk met right's head early:
            # contigs overlap by -ins_len bases

    # --- readsCrossGap fallback (localAsm.c:2035): a single read
    # anchored by exact K-mers on both flanks bridges the gap ---
    for slot, gi in enumerate(need_asm):
        if filled[gi]:
            continue
        left, right, gap = junctions[gi]
        anchor_l = left[-k:]
        anchor_r = right[:k]
        rds = gap_reads[gi] if gi < len(gap_reads) else None
        if rds is None:
            continue
        for rd in rds:
            s = bits.decode_seq(np.asarray(rd, np.uint8))
            for seq in (s, bits.revcomp_str(s)):
                i = seq.find(anchor_l)
                if i < 0:
                    continue
                j = seq.find(anchor_r, i + 1)
                if j < 0:
                    continue
                ins = seq[i + k : j]
                if abs(len(ins) - gap) > tol + k:
                    continue
                filled[gi] = True
                fill_seq[gi] = ins
                break
            if filled[gi]:
                break
    return GapFillResult(filled, fill_seq, overlap)
