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


@functools.partial(jax.jit, donate_argnums=(0,))
def _build_device(keys, prev, nxt, valid):
    """Sort + segment-reduce one k-mer stream.  Returns full-capacity
    (padded) arrays plus the number of unique entries.

    Perf-critical trick: the 7-bit payload (valid:1, prev:3, next:3)
    is folded into spare low bits of a widened key, so XLA's variadic
    sort moves 2-3 uint32 operands instead of W keys + 3 payload
    columns — the sort is the dominant cost of counting on TPU and
    scales with total bytes moved."""
    n, w = keys.shape
    wp = (32 * w + 7 + 31) // 32  # lanes for key<<7 | payload
    payload = (valid.astype(jnp.uint32) << 6) \
        | (prev.astype(jnp.uint32) << 3) | nxt.astype(jnp.uint32)
    packed = bits.shl_const(bits.widen(keys, wp), 7)
    packed = packed.at[..., -1].set(packed[..., -1] | payload)
    packed = jnp.where(valid[:, None], packed, jnp.uint32(0xFFFFFFFF))

    res = jax.lax.sort(
        tuple(packed[:, i] for i in range(wp)), num_keys=wp)
    spacked = jnp.stack(res, axis=-1)
    sp = spacked[:, -1]
    svalid = ((sp >> 6) & 1).astype(bool) & \
        ~jnp.all(spacked == jnp.uint32(0xFFFFFFFF), axis=-1)
    sprev = ((sp >> 3) & 7).astype(jnp.uint8)
    snxt = (sp & 7).astype(jnp.uint8)
    skeys = bits._shr_const(spacked, 7)[:, wp - w:]

    first = jnp.concatenate(
        [jnp.ones((1,), bool),
         jnp.any(skeys[1:] != skeys[:-1], axis=-1)]
    )
    first = first & svalid  # sentinel block contributes nothing
    num_unique = jnp.sum(first.astype(jnp.int32))
    n_valid = jnp.sum(svalid.astype(jnp.int32))  # valid rows sort first

    # Scatter-free segment reduction: TPU scatters/segment_sums are
    # ~100ms per pass at 10M rows, so instead (a) one cheap 1-operand
    # sort compacts head positions, (b) per-segment sums become
    # differences of prefix sums gathered at the segment boundaries.
    idx = jnp.arange(n, dtype=jnp.int32)
    hkey = jnp.where(first, idx, n)
    (hidx,) = jax.lax.sort((hkey,), num_keys=1)  # head row of segment j
    nxt_h = jnp.concatenate([hidx[1:], jnp.full((1,), n, jnp.int32)])
    seg_end = jnp.minimum(nxt_h, n_valid)
    count = jnp.maximum(seg_end - hidx, 0)

    live_head = hidx < n
    uniq_keys = jnp.where(
        live_head[:, None],
        skeys[jnp.clip(hidx, 0, n - 1)], jnp.uint32(0xFFFFFFFF))

    ones = svalid.astype(jnp.int32)
    onehot = jnp.concatenate(
        [jnp.stack([ones * (sprev == b) for b in range(4)], axis=-1),
         jnp.stack([ones * (snxt == b) for b in range(4)], axis=-1)],
        axis=-1)  # (n, 8)
    prefix = jnp.concatenate(
        [jnp.zeros((1, 8), jnp.int32), jnp.cumsum(onehot, axis=0)])
    cov = prefix[seg_end] - prefix[jnp.clip(hidx, 0, n)]
    l_cov = jnp.where(live_head[:, None], cov[:, :4], 0)
    r_cov = jnp.where(live_head[:, None], cov[:, 4:], 0)
    return uniq_keys, count, l_cov, r_cov, num_unique


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


def merge(a: KmerTable, b: KmerTable) -> KmerTable:
    """Merge two tables (for streamed/batched counting): concat, re-sort,
    segment-add counts and coverages."""
    keys = jnp.concatenate([a.keys, b.keys])
    count = jnp.concatenate([a.count, b.count])
    l_cov = jnp.concatenate([a.l_cov, b.l_cov])
    r_cov = jnp.concatenate([a.r_cov, b.r_cov])
    n_tot, w = keys.shape
    skeys, scount, sl0, sl1, sl2, sl3, sr0, sr1, sr2, sr3 = _sort_by_keys(
        keys, count,
        l_cov[:, 0], l_cov[:, 1], l_cov[:, 2], l_cov[:, 3],
        r_cov[:, 0], r_cov[:, 1], r_cov[:, 2], r_cov[:, 3])
    svalid = ~jnp.all(skeys == jnp.uint32(0xFFFFFFFF), axis=-1)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(skeys[1:] != skeys[:-1], axis=-1)])
    first = first & svalid
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    num_unique = jnp.maximum(seg[-1] + 1, 0) * jnp.any(svalid)
    seg_c = jnp.clip(seg, 0, n_tot - 1)

    def seg_sum(x):
        return jax.ops.segment_sum(
            jnp.where(svalid, x, 0), seg_c, num_segments=n_tot)

    count_m = seg_sum(scount)
    l_m = jnp.stack([seg_sum(sl0), seg_sum(sl1), seg_sum(sl2), seg_sum(sl3)], -1)
    r_m = jnp.stack([seg_sum(sr0), seg_sum(sr1), seg_sum(sr2), seg_sum(sr3)], -1)
    uniq_keys = jnp.full((n_tot, w), jnp.uint32(0xFFFFFFFF))
    uniq_keys = uniq_keys.at[jnp.where(first, seg_c, n_tot)].set(
        skeys, mode="drop")
    n = int(num_unique)
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


@jax.jit
def lookup(keys: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Vectorized multiword lower-bound binary search.

    keys: (cap, W) ascending (sentinel-padded).  queries: (M, W).
    Returns (M,) int32 row index, or -1 when absent.  Replaces
    search_kmerset's probe loop (src/newhash.c:239-283) with 32 fixed
    bisection steps, fully data-parallel across queries.
    """
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
