"""Mesh-resident map stage: sharded contig index + routed read voting.

The reference threads BOTH hot read passes — the pregraph hash build
AND prlRead2Ctg (src/prlRead2Ctg.c:656, worker pool identical to
prlHashReads.c's); prlHashCtg (src/prlHashCtg.c:287) shards the
contig k-mer index over the same hash-route.  This module is their
mesh twin:

* shard_index — split the dense sorted ContigIndex (stages/map.py)
  into contiguous key ranges along the SAME inverse-CDF word-0
  boundaries the pregraph table uses (sharded_count._owner_boundaries)
  so the routed lookup's owner function applies unchanged.
* map_reads_sharded — reads are data-parallel over shards; each
  shard chops its block, one routed lookup resolves every k-mer to a
  global index row, one routed gather pulls (ctg, pos, orient), and
  parse1read's voting (stages/map.vote) runs per shard under
  shard_map.  Only the per-read placements and group COO return.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import dictionary
from ..stages import map as map_stage
from . import sharded_count, sharded_graph

AXIS = sharded_graph.AXIS

_CHOP_CACHE: dict = {}
_VOTE_CACHE: dict = {}


class ShardedContigIndex(NamedTuple):
    """ContigIndex split into per-shard contiguous key ranges."""

    keys: jnp.ndarray     # (D, capL, W) uint32 ascending per shard
    payload: jnp.ndarray  # (D, capL, 3) int32: ctg, pos, is_rc
    n: jnp.ndarray        # (D,) int32 live rows per shard
    deleted: jnp.ndarray  # (D, capL) int32 zeros (lookup contract)
    ctg_len: jnp.ndarray  # (Ccap,) int32 replicated
    twin: jnp.ndarray     # (Ccap,) int32 replicated


def shard_index(mesh: Mesh, index: map_stage.ContigIndex,
                k: int) -> ShardedContigIndex:
    """Split the dense sorted index by the routed-lookup owner
    boundaries (one host pass over O(contig k-mers) — the index is
    condensed-graph-sized, orders below the read set)."""
    d = mesh.shape[AXIS]
    n = int(index.n)
    keys = np.asarray(index.keys[:n])
    payload = np.stack([np.asarray(index.ctg[:n]),
                        np.asarray(index.pos[:n]),
                        np.asarray(index.is_rc[:n]).astype(np.int32)],
                       axis=-1).astype(np.int32)
    bounds = sharded_count._owner_boundaries(k, d)
    splits = np.searchsorted(keys[:, 0] if n else np.zeros(0, np.uint32),
                             bounds, side="left")
    starts = np.concatenate([[0], splits, [n]]).astype(np.int64)
    per = np.diff(starts)
    cap_l = dictionary.round_up(max(int(per.max()) if d else 1, 1))
    w = index.keys.shape[-1]
    sk = np.full((d, cap_l, w), 0xFFFFFFFF, np.uint32)
    sp = np.full((d, cap_l, 3), -1, np.int32)
    for s in range(d):
        a, b = starts[s], starts[s + 1]
        sk[s, : b - a] = keys[a:b]
        sp[s, : b - a] = payload[a:b]
    sh3 = NamedSharding(mesh, P(AXIS, None, None))
    sh2 = NamedSharding(mesh, P(AXIS, None))
    sh1 = NamedSharding(mesh, P(AXIS))
    return ShardedContigIndex(
        jax.device_put(jnp.asarray(sk), sh3),
        jax.device_put(jnp.asarray(sp), sh3),
        jax.device_put(jnp.asarray(per.astype(np.int32)), sh1),
        jax.device_put(jnp.zeros((d, cap_l), jnp.int32), sh2),
        index.ctg_len, index.twin)


def _make_chop(mesh: Mesh, k: int, r_loc: int, read_len: int):
    from ..ops import kmer as kmer_mod

    def step(seqs, lengths):
        seqs = seqs.reshape(r_loc, read_len)
        lengths = lengths.reshape(r_loc)
        s = kmer_mod.chop_reads(seqs, lengths, k)
        kq = jnp.where(s.valid[:, None], s.kmers, jnp.uint32(0xFFFFFFFF))
        return kq[None], s.is_rc[None], s.valid[None]

    return jax.jit(jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS)),
        out_specs=(P(AXIS, None, None), P(AXIS, None), P(AXIS, None))))


def map_reads_sharded(mesh: Mesh, sidx: ShardedContigIndex, seqs,
                      lengths, k: int, map_len: int = 32
                      ) -> map_stage.ReadPlacements:
    """Sharded twin of stages/map.map_reads — same ReadPlacements
    contract (flat arrays in batch-row read order)."""
    d = mesh.shape[AXIS]
    r0, l = seqs.shape
    pad = (-r0) % d
    if pad:
        seqs = np.concatenate([seqs, np.full((pad, l), 4, np.uint8)])
        lengths = np.concatenate(
            [lengths, np.zeros(pad, np.asarray(lengths).dtype)])
    r = r0 + pad
    r_loc = r // d
    p = l - k + 1
    cap_l = sidx.keys.shape[1]
    router = sharded_graph.Router(mesh, cap_l)

    ckey = (id(mesh), k, r_loc, l)
    chop = _CHOP_CACHE.get(ckey)
    if chop is None:
        chop = _make_chop(mesh, k, r_loc, l)
        _CHOP_CACHE[ckey] = chop
    sh2 = NamedSharding(mesh, P(AXIS, None))
    sh1 = NamedSharding(mesh, P(AXIS))
    seqs_d = jax.device_put(jnp.asarray(seqs), sh2)
    lens_d = jax.device_put(jnp.asarray(lengths), sh1)
    kq, is_rc, valid, = chop(seqs_d, lens_d)

    rows = router.lookup(sidx.keys, sidx.n, sidx.deleted, kq, k=k)
    got = router.gather(sidx.payload, rows, n_fields=3)
    hit = rows >= 0

    vkey = (id(mesh), k, r_loc, p, map_len,
            int(sidx.ctg_len.shape[0]))
    vfn = _VOTE_CACHE.get(vkey)
    if vfn is None:
        def step(ctg_of, kpos, s_rc, w_rc, lens, ctg_len, twin):
            pl = map_stage.vote(
                ctg_of.reshape(r_loc, p), kpos.reshape(r_loc, p),
                s_rc.reshape(r_loc, p).astype(bool),
                w_rc.reshape(r_loc, p).astype(bool),
                lens.reshape(r_loc), ctg_len, twin, k, map_len)
            # lift local read ids to batch-row ids
            base = jax.lax.axis_index(AXIS).astype(jnp.int32) * r_loc
            return pl._replace(g_read=pl.g_read + base)

        vfn = jax.jit(jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None),
                      P(AXIS, None), P(AXIS), P(None), P(None)),
            out_specs=map_stage.ReadPlacements(
                *([P(AXIS)] * len(map_stage.ReadPlacements._fields)))))
        _VOTE_CACHE[vkey] = vfn

    ctg_of = jnp.where(hit, got[..., 0], -1).reshape(d, -1)
    kpos = jnp.where(hit, got[..., 1], 0).reshape(d, -1)
    s_rc = jnp.where(hit, got[..., 2], 0).reshape(d, -1)
    pl = vfn(ctg_of, kpos, s_rc,
             is_rc.reshape(d, -1).astype(jnp.int32),
             lens_d, sidx.ctg_len, sidx.twin)
    if not pad:
        return pl
    # drop the padding rows (they carry no valid groups — length 0)
    per_read = lambda x: x[:r0]
    per_grp = lambda x: x.reshape(r, p)[:r0].reshape(-1)
    return map_stage.ReadPlacements(
        per_read(pl.ctg), per_read(pl.pos), per_read(pl.reverse),
        per_read(pl.footprint), per_grp(pl.g_read), per_grp(pl.g_ctg),
        per_grp(pl.g_ctg_off), per_grp(pl.g_read_off),
        per_grp(pl.g_align), per_grp(pl.g_valid),
        per_grp(pl.g_raw_ctg), per_grp(pl.g_raw_off),
        per_grp(pl.g_same))
