"""Multi-chip k-mer counting over a device mesh.

The scale plan (SURVEY.md §2.7): reads are DATA-parallel over the
mesh, the k-mer table is SPACE-sharded by key prefix — the TP analog;
a mouse-scale (~30GB) graph must live in aggregate HBM.  This module
implements the routed counting step AND persistent per-shard
accumulation:

    shard_map over mesh axis "shards":
      1. chop local read batch -> canonical k-mer stream   (local)
      2. owner = top used bits of the canonical key        (local)
      3. bucket stream by owner, pad to a static bucket    (local sort)
      4. jax.lax.all_to_all routes packed rows to owners   (ICI)
      5. owner sorts + dedups its received rows            (local)

    per-shard LSM merge (merge_sharded, also shard_map) accumulates
    batch tables INTO the resident shard — the global table never
    leaves the mesh during counting; coverage splitting happens once
    at the end (finalize_sharded).

which replaces the reference's "every worker scans the whole shared
buffer and takes its own" scheme (prlHashReads.c:79-92) with an
explicit ICI collective, and its per-thread KmerSets with mesh-resident
sorted shards.  Prefix sharding keeps each shard's keys a contiguous
sorted range, so a global lookup is: route query to owner (same
all_to_all split points) + local bisection (lookup_sharded — the
search_kmerset analog, src/newhash.c:239-283).

Canonical keys skew low (min of value and revcomp); shard boundaries
are the analytic inverse-CDF split points (see _owner_boundaries), so
expected shard mass is equal.  Residual data skew is caught by an
overflow counter; the stage driver retries with a larger bucket.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import bits, dictionary, kmer

AXIS = "shards"


class ShardedPacked(NamedTuple):
    """Per-shard deduped (k-mer, context) rows resident on the mesh."""

    rows: jnp.ndarray    # (D, cap, WP) uint32, each shard ascending
    count: jnp.ndarray   # (D, cap) int32
    n: jnp.ndarray       # (D,) int32 live rows per shard
    dropped: jnp.ndarray  # (D,) int32 overflowed records (should be 0)


class ShardedTable(NamedTuple):
    """Per-shard finalized k-mer table (global order = shard-major)."""

    keys: jnp.ndarray    # (D, cap, W) uint32, each shard ascending
    count: jnp.ndarray   # (D, cap) int32
    l_cov: jnp.ndarray   # (D, cap, 4) int32
    r_cov: jnp.ndarray   # (D, cap, 4) int32
    n: jnp.ndarray       # (D,) int32 live rows per shard


def _owner_boundaries(k: int, n_shards: int) -> np.ndarray:
    """Equal-mass split points over word 0 of a canonical key.

    A canonical k-mer is min(x, revcomp(x)); for uniform x its
    normalized value p has density 2(1-p), CDF F(p) = 2p - p^2, so raw
    top-bit prefix shards skew ~2x toward shard 0.  The inverse-CDF
    boundaries p_i = 1 - sqrt(1 - i/d) balance the expected mass while
    keeping the owner function monotone in the key — each shard still
    owns a contiguous sorted key range (gather stays a concatenation).
    """
    import math

    w = bits.words_for_k(k)
    used = 2 * k - 32 * (w - 1)  # live bits in the top word
    top = float(1 << used)
    return np.asarray(
        [min(int((1.0 - math.sqrt(1.0 - i / n_shards)) * top),
             (1 << used) - 1)
         for i in range(1, n_shards)], dtype=np.uint32)


def count_step(k: int, n_shards: int, bucket_cap: int, out_cap: int):
    """Build the per-shard counting function for shard_map.

    Returns f(seqs_local, lengths_local) -> shard of ShardedPacked.
    Static geometry: bucket_cap per-destination records, out_cap
    deduped rows per shard.
    """
    wp = dictionary.packed_width_k(k)
    bounds = _owner_boundaries(k, n_shards)

    def step(seqs, lengths):
        stream = kmer.chop_reads(seqs, lengths, k)
        n = stream.kmers.shape[0]
        owner = jnp.sum(
            stream.kmers[:, 0:1] >= jnp.asarray(bounds)[None, :],
            axis=1).astype(jnp.int32)
        owner = jnp.where(stream.valid, owner,
                          n_shards)  # invalid -> drop bucket

        # One packed row per record (key + valid/prev/next bits,
        # dictionary.pack_stream) is the unit everything moves:
        # a 1-key payload sort groups records by owner (payload sorts
        # are ~5x cheaper than the gathers/scatters they replace),
        # one fused monotonic gather slots each owner run into its
        # fixed-size bucket, and a single all_to_all routes all lanes.
        packed = dictionary.pack_stream(
            stream.kmers, stream.prev, stream.next, stream.valid, k)
        res = jax.lax.sort(
            (owner,) + tuple(packed[:, i] for i in range(wp)),
            num_keys=1)
        s_owner = res[0]
        s_packed = jnp.stack(res[1:], axis=-1)

        start = jnp.searchsorted(
            s_owner, jnp.arange(n_shards + 1, dtype=jnp.int32)
        ).astype(jnp.int32)  # (n_shards+1,) run starts; [-1] = #valid
        cnt = start[1:] - start[:-1]
        dropped = jnp.sum(jnp.maximum(cnt - bucket_cap, 0))

        slot = jnp.arange(bucket_cap, dtype=jnp.int32)[None, :]
        src = start[:-1][:, None] + slot          # (n_shards, bucket)
        in_run = slot < cnt[:, None]
        send = jnp.where(
            in_run.reshape(-1)[:, None],
            s_packed[jnp.clip(src.reshape(-1), 0, n - 1)],
            jnp.uint32(0xFFFFFFFF))               # (n_shards*bucket, WP)

        recv = jax.lax.all_to_all(
            send.reshape(n_shards, bucket_cap, wp), AXIS,
            split_axis=0, concat_axis=0, tiled=False).reshape(-1, wp)

        # local dedup: same slim-sort core as the single-device build
        rows, count, n_unique = dictionary._reduce_rows(recv)
        m = recv.shape[0]

        def fit(x, fill):
            pad_shape = (out_cap - min(out_cap, m),) + x.shape[1:]
            out = x[:out_cap]
            if pad_shape[0]:
                out = jnp.concatenate(
                    [out, jnp.full(pad_shape, fill, x.dtype)])
            return out

        live = jnp.arange(out_cap) < n_unique
        return (
            fit(rows, 0xFFFFFFFF)[None],
            jnp.where(live, fit(count, 0), 0)[None],
            n_unique[None],
            dropped[None],
        )

    return step


def make_sharded_counter(mesh: Mesh, k: int, batch: int, read_len: int,
                         bucket_cap: int | None = None,
                         out_cap: int | None = None):
    """jit-compiled sharded counting step over `mesh` (axis 'shards').

    seqs: (D*batch, read_len) uint8, lengths: (D*batch,) — sharded on
    axis 0.  Returns a ShardedPacked (one batch's deduped rows).
    """
    d = mesh.shape[AXIS]
    windows = read_len - k + 1
    n_local = batch * windows
    # generous defaults: 2x average for skew
    bucket_cap = bucket_cap or max(128, (2 * n_local) // d)
    out_cap = out_cap or dictionary.round_up(d * bucket_cap)

    step = count_step(k, d, bucket_cap, out_cap)
    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS)),
        out_specs=(P(AXIS, None, None), P(AXIS, None), P(AXIS), P(AXIS)))

    @jax.jit
    def run(seqs, lengths):
        return ShardedPacked(*mapped(seqs, lengths))

    return run


def make_sharded_merger(mesh: Mesh):
    """Per-shard LSM merge step: combines two mesh-resident
    ShardedPacked accumulations WITHOUT gathering — each shard merges
    its own sorted row range locally (the persistent-residency
    analogue of put_kmerset updating the thread-local KmerSet,
    src/newhash.c:411-462)."""

    def shard_merge(ra, ca, rb, cb):
        rows = jnp.concatenate([ra[0], rb[0]])
        count = jnp.concatenate([ca[0], cb[0]])
        rows_c, count_c, n_u = dictionary._merge_packed_device.__wrapped__(
            rows, count)
        return rows_c[None], count_c[None], n_u[None]

    mapped = jax.shard_map(
        shard_merge, mesh=mesh,
        in_specs=(P(AXIS, None, None), P(AXIS, None),
                  P(AXIS, None, None), P(AXIS, None)),
        out_specs=(P(AXIS, None, None), P(AXIS, None), P(AXIS)))

    @jax.jit
    def merge(a: ShardedPacked, b: ShardedPacked) -> ShardedPacked:
        rows, count, n = mapped(a.rows, a.count, b.rows, b.count)
        return ShardedPacked(rows, count, n, a.dropped + b.dropped)

    return merge


def make_sharded_finalizer(mesh: Mesh, k: int):
    """Per-shard coverage split: mesh-resident ShardedPacked ->
    ShardedTable, one local finalize per shard."""

    def shard_fin(rows, count):
        keys, cnt, l_cov, r_cov, n_u = dictionary._finalize_device.__wrapped__(
            rows[0], count[0], k)
        cap = keys.shape[0]
        live = jnp.arange(cap) < n_u
        cnt = jnp.where(live, cnt, 0)
        l_cov = jnp.clip(jnp.where(live[:, None], l_cov, 0),
                         0, dictionary.MAX_KMER_COV)
        r_cov = jnp.clip(jnp.where(live[:, None], r_cov, 0),
                         0, dictionary.MAX_KMER_COV)
        return (keys[None], cnt[None], l_cov[None], r_cov[None], n_u[None])

    mapped = jax.shard_map(
        shard_fin, mesh=mesh,
        in_specs=(P(AXIS, None, None), P(AXIS, None)),
        out_specs=(P(AXIS, None, None), P(AXIS, None), P(AXIS, None, None),
                   P(AXIS, None, None), P(AXIS)))

    @jax.jit
    def fin(sp: ShardedPacked) -> ShardedTable:
        return ShardedTable(*mapped(sp.rows, sp.count))

    return fin


def gather_to_table(st) -> dictionary.KmerTable:
    """Concatenate shard ranges into a single host-side KmerTable
    (prefix sharding => shard-major concatenation is globally sorted).
    Called ONCE at the end of counting for graph passes that still run
    single-device; counting itself never gathers."""
    if isinstance(st, ShardedPacked):
        raise TypeError("finalize_sharded before gather_to_table")
    d, cap, w = st.keys.shape
    ks, cs, ls, rs = [], [], [], []
    for s in range(d):
        n = int(st.n[s])
        ks.append(np.asarray(st.keys[s][:n]))
        cs.append(np.asarray(st.count[s][:n]))
        ls.append(np.asarray(st.l_cov[s][:n]))
        rs.append(np.asarray(st.r_cov[s][:n]))
    keys = np.concatenate(ks)
    n_tot = keys.shape[0]
    capacity = dictionary.round_up(max(n_tot, 1))
    pad = capacity - n_tot
    keys = np.concatenate([keys, np.full((pad, w), 0xFFFFFFFF, np.uint32)])
    count = np.concatenate([np.concatenate(cs),
                            np.zeros(pad, np.int32)])
    l_cov = np.concatenate([np.concatenate(ls),
                            np.zeros((pad, 4), np.int32)])
    r_cov = np.concatenate([np.concatenate(rs),
                            np.zeros((pad, 4), np.int32)])
    return dictionary.KmerTable(
        jnp.asarray(keys), jnp.asarray(count), jnp.asarray(l_cov),
        jnp.asarray(r_cov), jnp.int32(n_tot),
        jnp.zeros(capacity, bool))
