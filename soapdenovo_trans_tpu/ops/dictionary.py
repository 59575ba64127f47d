"""Sorted k-mer dictionary: the TPU-native k-mer "hash table".

Replaces the reference's open-addressing KmerSet (src/newhash.c:160-462,
src/inc/newhash.h:65-88).  An open-addressing table is the wrong shape
for a vector machine — random scatter with probe chains serializes.
Instead:

* build  = radix-style ``jax.lax.sort`` over the W uint32 key lanes
  (lexicographic == numeric order, see ops/bits.py) + boundary
  detection + ``segment_sum`` for count / per-base left-right coverage
  (the reference's l_links/r_links 4x6-bit counters,
  src/inc/newhash.h:38-53, capped at MAX_KMER_COV=63).
* lookup = branchless vectorized binary search over the sorted keys
  (32 fixed bisection steps), thousands of probes in flight per lane —
  the analogue of search_kmerset (src/newhash.c:239-283).

Both are single fused XLA programs; there is no rehash/growth (the
reference's encap_kmerset) because the sorted build sizes itself.
Invalid/masked rows sort to the end via an all-ones sentinel key.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import bits

MAX_KMER_COV = 63  # reference: src/inc/newhash.h:30


class KmerTable(NamedTuple):
    """Sorted unique canonical k-mers + de Bruijn node payload.

    Rows [0, n) are real entries in ascending key order; rows [n, cap)
    are all-ones sentinel padding (so lookups of real k-mers never hit
    them and shapes stay static/aligned).
    """

    keys: jnp.ndarray    # (cap, W) uint32, ascending; sentinel-padded
    count: jnp.ndarray   # (cap,) int32 occurrence count (not capped)
    l_cov: jnp.ndarray   # (cap, 4) int32 left-extension base coverage, capped 63
    r_cov: jnp.ndarray   # (cap, 4) int32 right-extension coverage, capped 63
    n: jnp.ndarray       # () int32 number of real entries
    deleted: jnp.ndarray  # (cap,) bool — node removed by a cleaning pass

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]


def _sentinel_rows(num: int, w: int) -> jnp.ndarray:
    return jnp.full((num, w), jnp.uint32(0xFFFFFFFF))


def _sort_by_keys(keys: jnp.ndarray, *payload):
    """Sort rows by multiword key (ascending); payload reordered along."""
    w = keys.shape[-1]
    operands = tuple(keys[:, i] for i in range(w)) + tuple(payload)
    res = jax.lax.sort(operands, num_keys=w)
    sorted_keys = jnp.stack(res[:w], axis=-1)
    return (sorted_keys,) + tuple(res[w:])


def round_up(x: int, m: int = 128) -> int:
    return ((x + m - 1) // m) * m


def pack_stream(keys, prev, nxt, valid):
    """Fold the 7-bit per-kmer payload (valid:1, prev:3, next:3) into
    spare low bits of a widened key -> (n, WP) uint32 rows.  Invalid
    rows become all-ones sentinels.  One packed row is the unit the
    counting sorts and collectives move."""
    w = keys.shape[-1]
    wp = packed_width(w)
    payload = (valid.astype(jnp.uint32) << 6) \
        | (prev.astype(jnp.uint32) << 3) | nxt.astype(jnp.uint32)
    packed = bits.shl_const(bits.widen(keys, wp), 7)
    packed = packed.at[..., -1].set(packed[..., -1] | payload)
    return jnp.where(valid[:, None], packed, jnp.uint32(0xFFFFFFFF))


def packed_width(w: int) -> int:
    return (32 * w + 7 + 31) // 32  # lanes for key<<7 | payload


def reduce_packed(packed, w: int):
    """Sort + segment-reduce a packed k-mer stream (see pack_stream).
    Returns full-length (padded) arrays plus the unique-entry count.

    Perf notes (measured on v5e at 10M rows):
    * the main sort moves 2-3 packed uint32 operands instead of W
      keys + 3 payload columns;
    * everything after the sort is gather- and scatter-free.  A 10M
      random/monotonic gather costs 280-420ms on TPU while a 1-key
      sort carrying ten payload operands costs ~65ms, so per-segment
      reductions use the "last-row compaction" pattern: inclusive
      prefix sums + one payload sort that moves each segment's LAST
      row (whose prefix rows are the segment's cumulative totals) to
      the front, where adjacent differences give the per-segment
      sums."""
    n, wp = packed.shape

    res = jax.lax.sort(
        tuple(packed[:, i] for i in range(wp)), num_keys=wp)
    spacked = jnp.stack(res, axis=-1)
    sp = spacked[:, -1]
    svalid = ((sp >> 6) & 1).astype(bool) & \
        ~jnp.all(spacked == jnp.uint32(0xFFFFFFFF), axis=-1)
    sprev = ((sp >> 3) & 7).astype(jnp.uint8)
    snxt = (sp & 7).astype(jnp.uint8)
    skeys = bits._shr_const(spacked, 7)[:, wp - w:]

    # last[i]: i is the final (valid) row of its key segment.  Valid
    # rows sort before the sentinel block, so segments are contiguous
    # prefixes of the array.
    diff = jnp.concatenate(
        [jnp.any(skeys[1:] != skeys[:-1], axis=-1),
         jnp.ones((1,), bool)])
    last = diff & svalid
    num_unique = jnp.sum(last.astype(jnp.int32))

    ones = svalid.astype(jnp.int32)
    onehot = jnp.concatenate(
        [jnp.stack([ones * (sprev == b) for b in range(4)], axis=-1),
         jnp.stack([ones * (snxt == b) for b in range(4)], axis=-1)],
        axis=-1)  # (n, 8)
    cov_incl = jnp.cumsum(onehot, axis=0)  # inclusive prefix per base

    # Compaction: move each segment's last row (key lanes + inclusive
    # prefix rows) to the front, in key order, with one payload sort.
    idx = jnp.arange(n, dtype=jnp.int32)
    lkey = jnp.where(last, idx, n)
    res2 = jax.lax.sort(
        (lkey,) + tuple(skeys[:, i] for i in range(w))
        + tuple(cov_incl[:, j] for j in range(8)), num_keys=1)
    lidx = res2[0]
    live = lidx < n
    uniq_keys = jnp.where(
        live[:, None], jnp.stack(res2[1 : 1 + w], axis=-1),
        jnp.uint32(0xFFFFFFFF))
    cov_end = jnp.stack(res2[1 + w:], axis=-1)  # (n, 8) cumulative
    cov_prev = jnp.concatenate(
        [jnp.zeros((1, 8), jnp.int32), cov_end[:-1]])
    cov = jnp.where(live[:, None], cov_end - cov_prev, 0)
    # count: valid rows sort first, so the count of valid rows up to
    # and including row i is i+1 — no prefix sum needed.
    incl = jnp.where(live, lidx + 1, 0)
    count = jnp.maximum(
        incl - jnp.concatenate([jnp.zeros((1,), jnp.int32), incl[:-1]]), 0)
    return uniq_keys, count, cov[:, :4], cov[:, 4:], num_unique


@functools.partial(jax.jit, donate_argnums=(0,))
def _build_device(keys, prev, nxt, valid):
    """Sort + segment-reduce one k-mer stream (pack + reduce)."""
    w = keys.shape[-1]
    return reduce_packed(pack_stream(keys, prev, nxt, valid), w)


def build(stream, cap: int | None = None) -> KmerTable:
    """Build a KmerTable from a KmerStream (host-orchestrated sizing).

    The device pass computes unique keys/counts at full stream length;
    the host then reads the unique count and slices to a 128-aligned
    capacity — mirroring how the reference sizes its table from the
    data (newhash.c:411-462) but without incremental rehash.
    """
    uniq_keys, count, l_cov, r_cov, num_unique = _build_device(
        stream.kmers, stream.prev, stream.next, stream.valid
    )
    n = int(num_unique)
    cap = cap or round_up(max(n, 1))
    w = uniq_keys.shape[-1]
    if cap <= uniq_keys.shape[0]:
        keys = uniq_keys[:cap]
        count = count[:cap]
        l_cov = l_cov[:cap]
        r_cov = r_cov[:cap]
    else:
        pad = cap - uniq_keys.shape[0]
        keys = jnp.concatenate([uniq_keys, _sentinel_rows(pad, w)])
        count = jnp.concatenate([count, jnp.zeros(pad, jnp.int32)])
        l_cov = jnp.concatenate([l_cov, jnp.zeros((pad, 4), jnp.int32)])
        r_cov = jnp.concatenate([r_cov, jnp.zeros((pad, 4), jnp.int32)])
    row = jnp.arange(cap)
    live = row < n
    count = jnp.where(live, count, 0)
    l_cov = jnp.clip(jnp.where(live[:, None], l_cov, 0), 0, MAX_KMER_COV)
    r_cov = jnp.clip(jnp.where(live[:, None], r_cov, 0), 0, MAX_KMER_COV)
    return KmerTable(keys, count, l_cov, r_cov, jnp.int32(n),
                     jnp.zeros(cap, bool))


@jax.jit
def _merge_device(keys, count, l_cov, r_cov):
    """Concat-sorted segment reduction, gather/scatter-free (same
    last-row compaction pattern as _build_device)."""
    n_tot, w = keys.shape
    vals = jnp.concatenate([count[:, None], l_cov, r_cov], axis=-1)
    res = jax.lax.sort(
        tuple(keys[:, i] for i in range(w))
        + tuple(vals[:, j] for j in range(9)), num_keys=w)
    skeys = jnp.stack(res[:w], axis=-1)
    svals = jnp.stack(res[w:], axis=-1)
    svalid = ~jnp.all(skeys == jnp.uint32(0xFFFFFFFF), axis=-1)
    diff = jnp.concatenate(
        [jnp.any(skeys[1:] != skeys[:-1], axis=-1),
         jnp.ones((1,), bool)])
    last = diff & svalid
    num_unique = jnp.sum(last.astype(jnp.int32))

    incl = jnp.cumsum(jnp.where(svalid[:, None], svals, 0), axis=0)
    idx = jnp.arange(n_tot, dtype=jnp.int32)
    lkey = jnp.where(last, idx, n_tot)
    res2 = jax.lax.sort(
        (lkey,) + tuple(skeys[:, i] for i in range(w))
        + tuple(incl[:, j] for j in range(9)), num_keys=1)
    live = res2[0] < n_tot
    uniq_keys = jnp.where(
        live[:, None], jnp.stack(res2[1 : 1 + w], axis=-1),
        jnp.uint32(0xFFFFFFFF))
    v_end = jnp.stack(res2[1 + w:], axis=-1)
    v_prev = jnp.concatenate([jnp.zeros((1, 9), jnp.int32), v_end[:-1]])
    v = jnp.where(live[:, None], v_end - v_prev, 0)
    return uniq_keys, v[:, 0], v[:, 1:5], v[:, 5:9], num_unique


def merge(a: KmerTable, b: KmerTable) -> KmerTable:
    """Merge two tables (for streamed/batched counting): concat, re-sort,
    segment-add counts and coverages."""
    keys = jnp.concatenate([a.keys, b.keys])
    count = jnp.concatenate([a.count, b.count])
    l_cov = jnp.concatenate([a.l_cov, b.l_cov])
    r_cov = jnp.concatenate([a.r_cov, b.r_cov])
    w = keys.shape[-1]
    uniq_keys, count_m, l_m, r_m, num_unique = _merge_device(
        keys, count, l_cov, r_cov)
    n = int(num_unique)
    n_tot = uniq_keys.shape[0]
    cap = round_up(max(n, 1))
    if cap > n_tot:
        pad = cap - n_tot
        uniq_keys = jnp.concatenate([uniq_keys, _sentinel_rows(pad, w)])
        count_m = jnp.concatenate([count_m, jnp.zeros(pad, jnp.int32)])
        l_m = jnp.concatenate([l_m, jnp.zeros((pad, 4), jnp.int32)])
        r_m = jnp.concatenate([r_m, jnp.zeros((pad, 4), jnp.int32)])
    row = jnp.arange(cap)
    live = row < n
    return KmerTable(
        uniq_keys[:cap],
        jnp.where(live, count_m[:cap], 0),
        jnp.clip(jnp.where(live[:, None], l_m[:cap], 0), 0, MAX_KMER_COV),
        jnp.clip(jnp.where(live[:, None], r_m[:cap], 0), 0, MAX_KMER_COV),
        jnp.int32(n), jnp.zeros(cap, bool))


def lookup(keys: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Vectorized multiword lookup: (M,) int32 row index or -1.

    Replaces search_kmerset's probe loop (src/newhash.c:239-283).
    Two data-parallel strategies, chosen by static shape:

    * large query sets: sort-merge join — tag table rows 0 / query
      rows 1, one (W+1)-key sort groups each query behind its equal
      table row, two cummax scans propagate the latest table row and
      equal-key segment start forward, and a second 1-key sort
      restores query order.  Gather-free: at 10M queries this is ~5x
      faster than bisection on TPU (gathers are the expensive op).
    * small query sets (M << cap): 32-step branchless bisection —
      per-step gathers are M-sized, so the sort-join's O(cap) sort
      would dominate.
    """
    if queries.shape[0] * 64 < keys.shape[0]:
        return _lookup_bisect(keys, queries)
    return _lookup_sortjoin(keys, queries)


@jax.jit
def _lookup_sortjoin(keys: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    cap, w = keys.shape
    m = queries.shape[0]
    n_tot = cap + m
    lanes = tuple(jnp.concatenate([keys[:, i], queries[:, i]])
                  for i in range(w))
    tag = jnp.concatenate(
        [jnp.zeros(cap, jnp.uint32), jnp.ones(m, jnp.uint32)])
    src = jnp.concatenate([jnp.zeros(cap, jnp.int32),
                           jnp.arange(m, dtype=jnp.int32)])
    res = jax.lax.sort(lanes + (tag, src), num_keys=w + 1)
    stag, ssrc = res[w], res[w + 1]
    skeys = jnp.stack(res[:w], axis=-1)
    pos = jnp.arange(n_tot, dtype=jnp.int32)
    head = jnp.concatenate(
        [jnp.ones((1,), bool),
         jnp.any(skeys[1:] != skeys[:-1], axis=-1)])
    seg_start = jax.lax.cummax(jnp.where(head, pos, -1))
    last_table = jax.lax.cummax(jnp.where(stag == 0, pos, -1))
    trow = jnp.cumsum((stag == 0).astype(jnp.int32)) - 1
    hit = (last_table >= seg_start) & (stag == 1)
    result = jnp.where(hit, trow, -1)
    qkey = jnp.where(stag == 1, ssrc, m)  # queries first, in src order
    res2 = jax.lax.sort((qkey, result), num_keys=1)
    return res2[1][:m]


@jax.jit
def _lookup_bisect(keys: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    cap = keys.shape[0]
    m = queries.shape[0]
    steps = cap.bit_length()  # enough for the [0, cap) range to collapse
    lo = jnp.zeros(m, jnp.int32)
    hi = jnp.full(m, cap, jnp.int32)

    def step(i, carry):
        lo, hi = carry
        live = lo < hi  # converged lanes must not move again
        mid = (lo + hi) >> 1
        row = keys[jnp.clip(mid, 0, cap - 1)]
        less = bits.lex_less(row, queries)  # keys[mid] < q
        lo = jnp.where(live & less, mid + 1, lo)
        hi = jnp.where(live & ~less, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, step, (lo, hi))
    found_row = keys[jnp.clip(lo, 0, cap - 1)]
    hit = (lo < cap) & bits.lex_eq(found_row, queries)
    return jnp.where(hit, lo, -1)
