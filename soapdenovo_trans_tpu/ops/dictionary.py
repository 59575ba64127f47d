"""Sorted k-mer dictionary: the TPU-native k-mer "hash table".

Replaces the reference's open-addressing KmerSet (src/newhash.c:160-462,
src/inc/newhash.h:65-88).  An open-addressing table is the wrong shape
for a vector machine — random scatter with probe chains serializes.
Instead:

* the streaming unit is a PACKED ROW: ``key<<7 | 1<<6 | prev<<3 | next``
  in ``ceil((2K+7)/32)`` uint32 lanes (2 lanes for the default K=23) —
  the k-mer plus its left/right base context in one sortable integer.
* build  = one ``jax.lax.sort`` over the packed lanes + equal-row
  dedup, with per-row multiplicities read off sorted positions
  (no prefix scans, no gathers).  Batches accumulate by LSM-style
  ``merge_packed`` (concat + slim sort + segment-add).
* finalize = ONE pass at the end of counting splits each key's context
  rows into the reference's l_links/r_links per-base coverage counters
  (src/inc/newhash.h:38-53, saturating at MAX_KMER_COV=63) and the
  occurrence count.  Deferring this split keeps the hot per-batch sorts
  at <=4 operands; it is also exact — the reference saturates each
  6-bit counter incrementally, which equals summing exactly and
  capping once.
* lookup = branchless vectorized binary search over the sorted keys
  (or a gather-free sort-merge join for large query sets) —
  the analogue of search_kmerset (src/newhash.c:239-283).

There is no rehash/growth (the reference's encap_kmerset) because the
sorted build sizes itself.  Invalid/masked rows sort to the end via an
all-ones sentinel row; real rows always have at least one zero high
bit (2K+7 < 32*WP), so no real row ever equals the sentinel.
"""

from __future__ import annotations

import functools
import os
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


# Capacity quantization mode.  "exact" packs tight (fastest sorts,
# best for fixed-shape benches); "pow2" rounds capacities to powers of
# two so data-dependent shapes collapse onto a handful of compiled
# programs — essential on hardware where each XLA compile is tens of
# seconds (the pipeline driver enables it; cli.main).
CAP_MODE = os.environ.get("SOAPDENOVO_TPU_CAP_MODE", "exact")


def round_up(x: int, m: int = 128) -> int:
    r = ((x + m - 1) // m) * m
    if CAP_MODE == "pow2" and r > m:
        return 1 << (r - 1).bit_length()
    return r


def fit_cap(x, cap: int, fill):
    """Slice-or-pad x's leading axis to exactly ``cap`` rows.  A
    quantized capacity may EXCEED the physical source length (pow2
    mode rounds up aggressively), so plain ``x[:cap]`` is not safe."""
    if x.shape[0] < cap:
        pad_shape = (cap - x.shape[0],) + x.shape[1:]
        x = jnp.concatenate([x, jnp.full(pad_shape, fill, x.dtype)])
    return x[:cap]


def pack_stream(keys, prev, nxt, valid, k: int | None = None):
    """Fold the 7-bit per-kmer payload (valid:1, prev:3, next:3) into
    spare low bits of a widened key -> (n, WP) uint32 rows.  Invalid
    rows become all-ones sentinels.  One packed row is the unit the
    counting sorts and collectives move.

    With ``k`` given, the row is packed tight: WP = ceil((2K+7)/32)
    lanes — 2 for the default K=23 instead of 3, which is most of a
    sort pass saved per batch.  Without ``k`` the conservative
    full-key width is used."""
    w = keys.shape[-1]
    wp = packed_width_k(k) if k is not None else packed_width(w)
    payload = (valid.astype(jnp.uint32) << 6) \
        | (prev.astype(jnp.uint32) << 3) | nxt.astype(jnp.uint32)
    packed = bits.shl_const(bits.widen(keys, wp), 7)
    packed = packed.at[..., -1].set(packed[..., -1] | payload)
    return jnp.where(valid[:, None], packed, jnp.uint32(0xFFFFFFFF))


def packed_width(w: int) -> int:
    return (32 * w + 7 + 31) // 32  # lanes for key<<7 | payload


def packed_width_k(k: int) -> int:
    """Tight packed-row width for K: lanes for 2K key bits + 7 payload
    bits.  Always >= words_for_k(k), and always leaves at least one
    zero high bit in real rows (2K+7 is odd, 32*WP even), so the
    all-ones sentinel is unambiguous."""
    return (2 * k + 7 + 31) // 32


def unpack_rows(rows: jnp.ndarray, k: int):
    """Packed rows -> (keys (n, W), prev (n,), next (n,), valid (n,))."""
    w = bits.words_for_k(k)
    wp = rows.shape[-1]
    last = rows[..., -1]
    keys = bits._shr_const(rows, 7)[..., wp - w:]
    sentinel = jnp.all(rows == jnp.uint32(0xFFFFFFFF), axis=-1)
    valid = ((last >> 6) & 1).astype(bool) & ~sentinel
    prev = ((last >> 3) & 7).astype(jnp.uint8)
    nxt = (last & 7).astype(jnp.uint8)
    return keys, prev, nxt, valid


class PackedTable(NamedTuple):
    """Deduplicated (k-mer, context) rows — the accumulation format.

    Rows [0, n) are distinct packed rows (see pack_stream) in ascending
    order with their multiplicities; rows [n, cap) are all-ones
    sentinels.  This is what batches build and LSM merges combine;
    ``finalize`` turns the accumulated PackedTable into a KmerTable
    once per counting phase.
    """

    rows: jnp.ndarray   # (cap, WP) uint32, ascending; sentinel-padded
    count: jnp.ndarray  # (cap,) int32 multiplicity of each distinct row
    n: jnp.ndarray      # () int32 number of real rows

    @property
    def capacity(self) -> int:
        return self.rows.shape[0]


def _reduce_rows(packed):
    """Sort packed rows + dedup equal full rows; multiplicity is read
    off sorted positions (valid rows sort before the sentinel block,
    so the inclusive valid-row count at index i is just i+1) — two
    slim sorts, no prefix scans, no gathers."""
    n, wp = packed.shape
    res = jax.lax.sort(tuple(packed[:, i] for i in range(wp)), num_keys=wp)
    srows = jnp.stack(res, axis=-1)
    svalid = ~jnp.all(srows == jnp.uint32(0xFFFFFFFF), axis=-1)
    diff = jnp.concatenate(
        [jnp.any(srows[1:] != srows[:-1], axis=-1), jnp.ones((1,), bool)])
    last = diff & svalid
    num_unique = jnp.sum(last.astype(jnp.int32))
    idx = jnp.arange(n, dtype=jnp.int32)
    lkey = jnp.where(last, idx, n)
    res2 = jax.lax.sort(
        (lkey,) + tuple(srows[:, i] for i in range(wp)), num_keys=1)
    lidx = res2[0]
    live = lidx < n
    rows_c = jnp.where(live[:, None], jnp.stack(res2[1:], axis=-1),
                       jnp.uint32(0xFFFFFFFF))
    incl = jnp.where(live, lidx + 1, 0)
    count = jnp.maximum(
        incl - jnp.concatenate([jnp.zeros((1,), jnp.int32), incl[:-1]]), 0)
    return rows_c, count, num_unique


@functools.partial(jax.jit, static_argnums=(4,))
def _build_packed_device(keys, prev, nxt, valid, k):
    return _reduce_rows(pack_stream(keys, prev, nxt, valid, k))


def _fit_packed(rows, count, n: int, cap: int) -> PackedTable:
    wp = rows.shape[-1]
    if cap <= rows.shape[0]:
        rows, count = rows[:cap], count[:cap]
    else:
        pad = cap - rows.shape[0]
        rows = jnp.concatenate([rows, _sentinel_rows(pad, wp)])
        count = jnp.concatenate([count, jnp.zeros(pad, jnp.int32)])
    return PackedTable(rows, count, jnp.int32(n))


def build_packed(stream, k: int, cap: int | None = None) -> PackedTable:
    """One batch of the streaming build: KmerStream -> PackedTable.

    The per-batch analogue of put_kmerset's insert loop
    (src/newhash.c:411-462); host-side sizing to a 128-aligned
    capacity, like the reference sizing its table from the data."""
    rows, count, num_unique = _build_packed_device(
        stream.kmers, stream.prev, stream.next, stream.valid, k)
    n = int(num_unique)
    return _fit_packed(rows, count, n, cap or round_up(max(n, 1)))


@functools.partial(jax.jit, static_argnums=(2,))
def _build_from_reads_device(seqs, lengths, k):
    from . import kmer as kmer_mod

    stream = kmer_mod.chop_reads(seqs, lengths, k)
    return _reduce_rows(pack_stream(
        stream.kmers, stream.prev, stream.next, stream.valid, k))


def build_packed_from_reads(seqs, lengths, k: int,
                            cap: int | None = None) -> PackedTable:
    """Fused chop -> pack -> sort-dedup in ONE jit: the intermediate
    (N, W) k-mer stream never round-trips HBM between kernels (the
    separate chop/build calls each materialize ~16B/row)."""
    rows, count, num_unique = _build_from_reads_device(seqs, lengths, k)
    n = int(num_unique)
    return _fit_packed(rows, count, n, cap or round_up(max(n, 1)))


def build_packed_from_reads_many(batches, k: int) -> list:
    """Build several batches with OVERLAPPED dispatch: all device
    programs are enqueued before any host sync, so batch i+1 executes
    while the host waits on batch i's row count (each sequential
    build_packed_from_reads call hides none of the ~20 ms
    dispatch+read latency of a tunneled chip)."""
    outs = [_build_from_reads_device(s, l, k) for s, l in batches]
    return [_fit_packed(r, c, int(n), round_up(max(int(n), 1)))
            for r, c, n in outs]


@jax.jit
def _merge_packed_device(rows, count):
    n_tot, wp = rows.shape
    res = jax.lax.sort(
        tuple(rows[:, i] for i in range(wp)) + (count,), num_keys=wp)
    srows = jnp.stack(res[:wp], axis=-1)
    scount = res[wp]
    svalid = ~jnp.all(srows == jnp.uint32(0xFFFFFFFF), axis=-1)
    diff = jnp.concatenate(
        [jnp.any(srows[1:] != srows[:-1], axis=-1), jnp.ones((1,), bool)])
    last = diff & svalid
    num_unique = jnp.sum(last.astype(jnp.int32))
    incl = jnp.cumsum(jnp.where(svalid, scount, 0))
    idx = jnp.arange(n_tot, dtype=jnp.int32)
    lkey = jnp.where(last, idx, n_tot)
    res2 = jax.lax.sort(
        (lkey,) + tuple(srows[:, i] for i in range(wp)) + (incl,),
        num_keys=1)
    live = res2[0] < n_tot
    rows_c = jnp.where(live[:, None], jnp.stack(res2[1:1 + wp], axis=-1),
                       jnp.uint32(0xFFFFFFFF))
    c_end = res2[1 + wp]
    c_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), c_end[:-1]])
    count_c = jnp.where(live, c_end - c_prev, 0)
    return rows_c, count_c, num_unique


@jax.jit
def _dedup_sorted_device(rows, count):
    """Dedup an ALREADY-SORTED (sentinel-tailed) row array: equal-run
    count cumsum + 1-key compaction sort — the tail of
    _merge_packed_device without its initial full sort."""
    n_tot, wp = rows.shape
    svalid = ~jnp.all(rows == jnp.uint32(0xFFFFFFFF), axis=-1)
    diff = jnp.concatenate(
        [jnp.any(rows[1:] != rows[:-1], axis=-1), jnp.ones((1,), bool)])
    last = diff & svalid
    num_unique = jnp.sum(last.astype(jnp.int32))
    incl = jnp.cumsum(jnp.where(svalid, count, 0))
    idx = jnp.arange(n_tot, dtype=jnp.int32)
    lkey = jnp.where(last, idx, n_tot)
    res2 = jax.lax.sort(
        (lkey,) + tuple(rows[:, i] for i in range(wp)) + (incl,),
        num_keys=1)
    live = res2[0] < n_tot
    rows_c = jnp.where(live[:, None], jnp.stack(res2[1:1 + wp], axis=-1),
                       jnp.uint32(0xFFFFFFFF))
    c_end = res2[1 + wp]
    c_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), c_end[:-1]])
    count_c = jnp.where(live, c_end - c_prev, 0)
    return rows_c, count_c, num_unique


def _use_merge_kernel(wp: int) -> bool:
    import os

    if os.environ.get("SOAPDENOVO_TPU_NO_MERGE_KERNEL"):
        return False
    return wp == 2 and jax.default_backend() not in ("cpu",)


def merge_packed(a: PackedTable, b: PackedTable) -> PackedTable:
    """LSM combine of two PackedTables: merge + dedup.

    On TPU with 2-lane rows (K <= 28) the merge is the merge-path
    Pallas kernel (kernels/merge_path.py) — the inputs are already
    sorted, so re-sorting the concatenation is pure waste; elsewhere
    it falls back to concat + slim sort."""
    wp = a.rows.shape[-1]
    if _use_merge_kernel(wp):
        from ..kernels import merge_path

        rows, count = merge_path.merge_sorted_rows(
            a.rows, a.count, b.rows, b.count, a.n, b.n)
        rows_c, count_c, num_unique = _dedup_sorted_device(rows, count)
    else:
        rows = jnp.concatenate([a.rows, b.rows])
        count = jnp.concatenate([a.count, b.count])
        rows_c, count_c, num_unique = _merge_packed_device(rows, count)
    n = int(num_unique)
    return _fit_packed(rows_c, count_c, n, round_up(max(n, 1)))


@functools.partial(jax.jit, static_argnums=(2,))
def _finalize_device(rows, count, k):
    """Split context rows into per-key count + l/r per-base coverage.

    Rows are sorted with the key in the high bits, so each key's
    context rows are contiguous; the 8 coverage counters are exact
    sums of row multiplicities, capped once at MAX_KMER_COV — equal to
    the reference's per-increment saturation (newhash.h:38-53)."""
    n, wp = rows.shape
    w = bits.words_for_k(k)
    keys = bits._shr_const(rows, 7)[:, wp - w:]
    last_lane = rows[:, -1]
    svalid = ~jnp.all(rows == jnp.uint32(0xFFFFFFFF), axis=-1)
    prev = ((last_lane >> 3) & 7).astype(jnp.int32)
    nxt = (last_lane & 7).astype(jnp.int32)
    keydiff = jnp.concatenate(
        [jnp.any(keys[1:] != keys[:-1], axis=-1), jnp.ones((1,), bool)])
    last = keydiff & svalid
    num_unique = jnp.sum(last.astype(jnp.int32))
    cnt = jnp.where(svalid, count, 0)
    onehot = jnp.concatenate(
        [jnp.stack([cnt * (prev == b) for b in range(4)], axis=-1),
         jnp.stack([cnt * (nxt == b) for b in range(4)], axis=-1)],
        axis=-1)  # (n, 8)
    incl = jnp.cumsum(onehot, axis=0)
    incl_c = jnp.cumsum(cnt)
    idx = jnp.arange(n, dtype=jnp.int32)
    lkey = jnp.where(last, idx, n)
    res2 = jax.lax.sort(
        (lkey,) + tuple(keys[:, i] for i in range(w))
        + tuple(incl[:, j] for j in range(8)) + (incl_c,), num_keys=1)
    live = res2[0] < n
    uniq_keys = jnp.where(
        live[:, None], jnp.stack(res2[1:1 + w], axis=-1),
        jnp.uint32(0xFFFFFFFF))
    cov_end = jnp.stack(res2[1 + w:9 + w], axis=-1)
    cov_prev = jnp.concatenate([jnp.zeros((1, 8), jnp.int32), cov_end[:-1]])
    cov = jnp.where(live[:, None], cov_end - cov_prev, 0)
    c_end = res2[9 + w]
    c_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), c_end[:-1]])
    count_u = jnp.where(live, c_end - c_prev, 0)
    return uniq_keys, count_u, cov[:, :4], cov[:, 4:], num_unique


def finalize(pt: PackedTable, k: int, cap: int | None = None) -> KmerTable:
    """Accumulated PackedTable -> KmerTable (once per counting phase)."""
    uniq_keys, count, l_cov, r_cov, num_unique = _finalize_device(
        pt.rows, pt.count, k)
    return _fit_table(uniq_keys, count, l_cov, r_cov, int(num_unique), cap)


@functools.partial(jax.jit, static_argnums=(2,))
def _merge_finalize_device(rows, count, k):
    n_tot, wp = rows.shape
    res = jax.lax.sort(
        tuple(rows[:, i] for i in range(wp)) + (count,), num_keys=wp)
    return _finalize_device.__wrapped__(
        jnp.stack(res[:wp], axis=-1), res[wp], k)


def merge_finalize(a: PackedTable, b: PackedTable, k: int,
                   cap: int | None = None) -> KmerTable:
    """FINAL LSM merge + finalize fused: the dedup compaction between
    them is skipped entirely — _finalize_device aggregates per KEY
    from sorted rows with counts, so duplicate (k-mer, context) rows
    are absorbed by its cumsums.  Saves a full compaction sort and a
    host resize round-trip on the counting phase's critical path."""
    wp = a.rows.shape[-1]
    if _use_merge_kernel(wp):
        from ..kernels import merge_path

        rows, count = merge_path.merge_sorted_rows(
            a.rows, a.count, b.rows, b.count, a.n, b.n)
        uniq_keys, count_u, l_cov, r_cov, num_unique = _finalize_device(
            rows, count, k)
    else:
        rows = jnp.concatenate([a.rows, b.rows])
        count = jnp.concatenate([a.count, b.count])
        uniq_keys, count_u, l_cov, r_cov, num_unique = \
            _merge_finalize_device(rows, count, k)
    return _fit_table(uniq_keys, count_u, l_cov, r_cov, int(num_unique),
                      cap)


def _fit_table(uniq_keys, count, l_cov, r_cov, n: int,
               cap: int | None) -> KmerTable:
    cap = cap or round_up(max(n, 1))
    w = uniq_keys.shape[-1]
    if cap <= uniq_keys.shape[0]:
        keys, count = uniq_keys[:cap], count[:cap]
        l_cov, r_cov = l_cov[:cap], r_cov[:cap]
    else:
        pad = cap - uniq_keys.shape[0]
        keys = jnp.concatenate([uniq_keys, _sentinel_rows(pad, w)])
        count = jnp.concatenate([count, jnp.zeros(pad, jnp.int32)])
        l_cov = jnp.concatenate([l_cov, jnp.zeros((pad, 4), jnp.int32)])
        r_cov = jnp.concatenate([r_cov, jnp.zeros((pad, 4), jnp.int32)])
    live = jnp.arange(cap) < n
    count = jnp.where(live, count, 0)
    l_cov = jnp.clip(jnp.where(live[:, None], l_cov, 0), 0, MAX_KMER_COV)
    r_cov = jnp.clip(jnp.where(live[:, None], r_cov, 0), 0, MAX_KMER_COV)
    return KmerTable(keys, count, l_cov, r_cov, jnp.int32(n),
                     jnp.zeros(cap, bool))


# ---------------------------------------------------------------------------
# Sorted-run accumulation: the at-depth streaming path.
#
# The PackedTable pipeline (build_packed_from_reads + merge_packed)
# pays a dedup-compaction sort AND an int(n) host sync per batch and
# per merge; at 1e8-row depth those syncs serialize the dispatch
# pipeline and the compaction sorts dominate (measured: 23.7 Mkmers/s
# vs 54 at small shape, tools/prof_capacity.py).  The run path keeps
# everything async:
#
# * a build unit = ONE fused chop + pack + wp-key sort (no compaction,
#   no host sync) -> a SortedRun whose live-row count stays on device;
# * runs combine via the O(n) merge-path Pallas kernel in a binary
#   counter on CAPACITIES (static shapes, still no syncs; duplicate
#   rows simply carry their counts forward);
# * one dedup + fit + finalize at the very end (single host sync);
# * a generational collapse bounds HBM: when accumulated run capacity
#   exceeds `collapse_rows`, the counter folds and dedups to a
#   compacted base run (mouse-scale raw rows never coexist).
#
# Reference equivalent: prlRead2HashTable's 1e8-kmer fill loop
# (src/prlHashReads.c:42,338-707) — same streaming contract, but
# batches become sorted runs instead of hash-table inserts.
# ---------------------------------------------------------------------------


class SortedRun(NamedTuple):
    """Sorted (possibly duplicate-bearing) packed rows with counts.

    Unlike PackedTable, equal rows MAY repeat (each carrying a count);
    ``n`` is a DEVICE scalar — reading it is deliberately deferred so
    the build/merge pipeline never blocks on the host."""

    rows: jnp.ndarray   # (cap, WP) uint32 ascending; sentinel-padded
    count: jnp.ndarray  # (cap,) int32 multiplicity per row
    n: jnp.ndarray      # () int32 live rows (device scalar)

    @property
    def capacity(self) -> int:
        return self.rows.shape[0]


@functools.partial(jax.jit, static_argnums=(2,))
def _sorted_run_from_reads_device(seqs, lengths, k):
    from . import kmer as kmer_mod

    stream = kmer_mod.chop_reads(seqs, lengths, k)
    packed = pack_stream(
        stream.kmers, stream.prev, stream.next, stream.valid, k)
    wp = packed.shape[-1]
    res = jax.lax.sort(
        tuple(packed[:, i] for i in range(wp)), num_keys=wp)
    rows = jnp.stack(res, axis=-1)
    valid = ~jnp.all(rows == jnp.uint32(0xFFFFFFFF), axis=-1)
    cnt = valid.astype(jnp.int32)
    return rows, cnt, jnp.sum(cnt)


def sorted_run_from_reads(seqs, lengths, k: int) -> SortedRun:
    """One build unit: reads -> sorted run.  Fully async (no sync)."""
    rows, cnt, n = _sorted_run_from_reads_device(seqs, lengths, k)
    return SortedRun(rows, cnt, n)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _sorted_run_from_packed_device(data, n_flat, lengths, l, k):
    from . import readpack

    seqs = readpack.unpack_reads(data, n_flat, l)
    return _sorted_run_from_reads_device.__wrapped__(
        seqs, lengths.astype(jnp.int32), k)


def pack_host_reads(codes, lengths):
    """Pure-numpy half of a build unit: 2-bit pack (4x less tunnel H2D
    — a dominant counting cost on this rig, ops/readpack.py).  Split
    from the device_put so a pipeline can run pack(i+2) || H2D(i+1) ||
    device-build(i) on separate threads."""
    from . import readpack

    codes = np.asarray(codes)
    lengths = np.asarray(lengths)
    if lengths.max(initial=0) < 2**15:
        lengths = lengths.astype(np.int16)
    pr = readpack.pack_reads(codes)
    if pr is None:
        return ("raw", codes, lengths)
    return ("packed", pr.data, pr.n_flat, lengths, pr.l)


def put_prepped(packed):
    """device_put half of a build unit (see pack_host_reads)."""
    if packed[0] == "raw":
        _, codes, lengths = packed
        return ("raw", jax.device_put(codes), jax.device_put(lengths))
    _, data, n_flat, lengths, l = packed
    return ("packed", jax.device_put(data), jax.device_put(n_flat),
            jax.device_put(lengths), l)


def prep_host_reads(codes, lengths):
    """pack + device_put of a build unit in one call (non-pipelined
    callers); returns the opaque tuple for sorted_run_from_prepped."""
    return put_prepped(pack_host_reads(codes, lengths))


def sorted_run_from_prepped(prepped, k: int) -> SortedRun:
    """Device build from prep_host_reads output.  Fully async."""
    if prepped[0] == "raw":
        _, codes, lengths = prepped
        rows, cnt, n = _sorted_run_from_reads_device(
            codes, lengths.astype(jnp.int32), k)
    else:
        _, data, n_flat, lengths, l = prepped
        rows, cnt, n = _sorted_run_from_packed_device(
            data, n_flat, lengths, l, k)
    return SortedRun(rows, cnt, n)


def sorted_run_from_host_reads(codes, lengths, k: int) -> SortedRun:
    return sorted_run_from_prepped(prep_host_reads(codes, lengths), k)


@jax.jit
def _concat_sort_runs(ar, ac, br, bc):
    rows = jnp.concatenate([ar, br])
    count = jnp.concatenate([ac, bc])
    wp = rows.shape[-1]
    res = jax.lax.sort(
        tuple(rows[:, i] for i in range(wp)) + (count,), num_keys=wp)
    return jnp.stack(res[:wp], axis=-1), res[wp]


def merge_runs(a: SortedRun, b: SortedRun) -> SortedRun:
    """Combine two sorted runs WITHOUT dedup compaction: the merge-path
    kernel where available (O(n), no sort), else concat + slim sort.
    Still fully async."""
    wp = a.rows.shape[-1]
    if _use_merge_kernel(wp):
        from ..kernels import merge_path

        rows, count = merge_path.merge_sorted_rows(
            a.rows, a.count, b.rows, b.count, a.n, b.n)
    else:
        rows, count = _concat_sort_runs(a.rows, a.count, b.rows, b.count)
    return SortedRun(rows, count, a.n + b.n)


def collapse_run(run: SortedRun) -> SortedRun:
    """Dedup-compact a run (equal rows summed, uniques to the front)
    and slice to a fitted capacity.  The ONE host sync of the run
    pipeline — called at generational collapse and before finalize."""
    rows_c, count_c, num_unique = _dedup_sorted_device(run.rows, run.count)
    n = int(num_unique)
    pt = _fit_packed(rows_c, count_c, n, round_up(max(n, 1)))
    return SortedRun(pt.rows, pt.count, pt.n)


class RunAccumulator:
    """Binary counter over SortedRuns, merged on capacity rank; folds
    + dedups into a compacted base whenever accumulated capacity would
    exceed ``collapse_rows`` (HBM bound at mouse-scale row counts)."""

    def __init__(self, collapse_rows: int = 192_000_000):
        self.runs: list = []
        self.collapse_rows = collapse_rows

    def insert(self, r: SortedRun) -> None:
        self.runs.append(r)
        while (len(self.runs) >= 2 and
               self.runs[-2].capacity <= 2 * self.runs[-1].capacity):
            b = self.runs.pop()
            a = self.runs.pop()
            self.runs.append(merge_runs(a, b))
        if sum(x.capacity for x in self.runs) >= self.collapse_rows:
            self.runs = [collapse_run(self._fold())]

    def _fold(self) -> SortedRun:
        acc = self.runs[0]
        for x in self.runs[1:]:
            acc = merge_runs(acc, x)
        return acc

    def finish(self) -> SortedRun | None:
        if not self.runs:
            return None
        return self._fold()


def finalize_run(run: SortedRun, k: int,
                 cap: int | None = None) -> KmerTable:
    """Accumulated run -> KmerTable: dedup + fit (one sync) keeps the
    finalize pass — whose (cap, 8) coverage cumsum is the widest
    intermediate — at compacted size, then split contexts."""
    c = collapse_run(run)
    uniq_keys, count, l_cov, r_cov, num_unique = _finalize_device(
        c.rows, c.count, k)
    return _fit_table(uniq_keys, count, l_cov, r_cov, int(num_unique),
                      cap)


def build(stream, k: int, cap: int | None = None) -> KmerTable:
    """Single-shot build: KmerStream -> KmerTable (small inputs/tests;
    the streaming path is build_packed + merge_packed + finalize)."""
    return finalize(build_packed(stream, k), k, cap=cap)


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
