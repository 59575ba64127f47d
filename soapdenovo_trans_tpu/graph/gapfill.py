"""Batched local gap assembly (-F): the TPU-native localAsm.

Reference: src/localAsm.c (readsInGap2DBgraph :321, searchFgap :739,
traceAlongDBgraph :564) driven by prlReadFillGap.c (check1scaf :707,
fill1scaf :739).  The reference fills each scaffold gap by building a
tiny k-mer graph from the reads assigned to that gap plus the two
flanking contig ends, then DFS-walking from the left flank's tail
k-mer to the right flank's head k-mer inside a distance window.

TPU-native reformulation: all gaps are assembled simultaneously.

* One global `chop_reads` over the (gap, read) batch; each k-mer is
  tagged with its gap id.
* One sort of (gap_id, kmer) builds every per-gap k-mer table at once
  (gap id is the leading key word, so each gap's slice is contiguous
  and a single global binary search answers per-gap lookups).
* The walk is a `lax.scan` over steps, advancing ALL gaps in
  lock-step: at each step the 4 candidate next k-mers are looked up
  (4 vectorized binary searches) and the heaviest-coverage present
  base is taken (greedy heaviest-extension; the reference's bounded
  DFS reduces to this on non-repetitive gaps — ties and dead ends
  terminate the walk, matching its trace-limit bail-outs).

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


@functools.partial(jax.jit, static_argnums=(4, 5))
def greedy_walk(tables: LocalTables, start, target, gap_id,
                k: int, max_steps: int):
    """Walk every gap simultaneously from its start k-mer.

    start/target: (G, W) uint32 *directed* k-mers (not canonical —
    canonicalization happens per lookup).  Returns
    (bases (max_steps, G) uint8, hit_step (G,) int32 — steps taken
    when the target was reached, or -1)."""
    g_n, w = start.shape

    def lookup4(cur):
        # candidates for each base b: next = shift-in(b)
        cands = [bits.next_kmer(cur, jnp.full(g_n, b, jnp.uint32), k)
                 for b in range(4)]
        counts = []
        for b in range(4):
            can, _ = bits.canonical(cands[b], k)
            q = jnp.concatenate(
                [gap_id.astype(jnp.uint32)[:, None], can], axis=-1)
            counts.append(_lookup_counts(tables, q))
        return cands, jnp.stack(counts, axis=-1)  # (G, 4)

    def step_fn(carry, _):
        cur, done, hit_step, step_i = carry
        cands, counts = lookup4(cur)
        best = jnp.argmax(counts, axis=-1).astype(jnp.uint8)
        best_cnt = jnp.max(counts, axis=-1)
        dead = best_cnt <= 0
        nxt = cands[0]
        for b in range(1, 4):
            nxt = jnp.where((best == b)[:, None], cands[b], nxt)
        reached = jnp.all(nxt == target, axis=-1) & ~done
        hit_step = jnp.where(reached, step_i + 1, hit_step)
        done = done | dead | reached
        cur = jnp.where(done[:, None], cur, nxt)
        emit = jnp.where(done & ~reached, jnp.uint8(255), best)
        return (cur, done, hit_step, step_i + 1), emit

    init = (start, jnp.zeros(g_n, bool), jnp.full(g_n, -1, jnp.int32),
            jnp.int32(0))
    (_, _, hit_step, _), bases = jax.lax.scan(
        step_fn, init, None, length=max_steps)
    return bases, hit_step


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

    start = np.zeros((len(need_asm), w), np.uint32)
    target = np.zeros((len(need_asm), w), np.uint32)
    for slot, gi in enumerate(need_asm):
        left, right, _ = junctions[gi]
        start[slot] = bits.kmer_from_string(left[-k:])[:w]
        target[slot] = bits.kmer_from_string(right[:k])[:w]
    bases, hit_step = greedy_walk(
        tables, jnp.asarray(start), jnp.asarray(target),
        jnp.arange(len(need_asm), dtype=jnp.int32), k, max_steps)
    bases = np.asarray(bases)      # (max_steps, slots)
    hit_step = np.asarray(hit_step)

    for slot, gi in enumerate(need_asm):
        hs = int(hit_step[slot])
        if hs < 0:
            continue
        gap = junctions[gi][2]
        # walked sequence includes the K bases overlapping right's head
        ins_len = hs - k
        if abs(max(ins_len, -k) - gap) > tol + k:
            continue  # outside the distance window: reject
        filled[gi] = True
        if ins_len >= 0:
            fill_seq[gi] = "".join("ACTG"[b] for b in bases[:ins_len, slot])
        else:
            overlap[gi] = -ins_len  # walk met right's head early:
            # contigs overlap by -ins_len bases
    return GapFillResult(filled, fill_seq, overlap)
