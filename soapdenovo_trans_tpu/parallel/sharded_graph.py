"""Routed primitives for mesh-resident graph state.

The k-mer table (and the de Bruijn graph derived from it) is
prefix-sharded over the device mesh (parallel/sharded_count.py); at
mouse scale (~30GB, reference README.md:9) it cannot be gathered to
one chip.  Every graph pass therefore needs three cross-shard
primitives, each an explicit ICI collective instead of the reference's
"every thread scans the shared buffer" scheme (prlHashReads.c:79-92):

* routed gather   — x[idx] where x is sharded by contiguous global
  index ranges and idx is arbitrary: queries are bucketed by owner
  shard, moved with one all_to_all, answered locally, and moved back.
* routed scatter  — segment add/max/or into globally-indexed rows:
  (idx, val) records are bucketed to the owner, one all_to_all, local
  segment reduction.
* routed lookup   — the search_kmerset analog (src/newhash.c:239-283):
  multiword keys are bucketed by the same inverse-CDF split points the
  resident table was built with, answered with a local bisection, and
  returned as GLOBAL row ids (shard * cap + local row).

Global index convention: shard s owns rows [s*cap, (s+1)*cap) of every
sharded array (equal static per-shard capacity).  Buckets have a
static per-destination capacity ``bcap``; overflow is counted, never
silently dropped — drivers retry with a doubled bucket (the same
pattern as the counting step's overflow retry).

``sharded_list_rank`` composes the gather into pointer-doubling chain
ranking (the sharded twin of ops/ranking.list_rank), which powers tip
clipping and unitig condensation on the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import bits

AXIS = "shards"
_NEG = jnp.int32(-(2 ** 31) + 1)


def _squeeze(x):
    return x.reshape(x.shape[1:])


def _bucket_by_owner(owner, n_dest, bcap, *payloads):
    """Sort records by owner and pack per-destination buckets.

    owner: (m,) int32 in [0, n_dest] (n_dest = drop bucket).
    Returns (buckets..., cnt, start, order) where each bucket is
    (n_dest, bcap, ...) with -1/sentinel fill, cnt (n_dest,) true
    counts (may exceed bcap — overflow), order (m,) the sort
    permutation (for the response trip).
    """
    m = owner.shape[0]
    slot = jnp.arange(m, dtype=jnp.int32)
    res = jax.lax.sort((owner, slot) + payloads, num_keys=1)
    s_owner, s_slot = res[0], res[1]
    s_payloads = res[2:]
    start = jnp.searchsorted(
        s_owner, jnp.arange(n_dest + 1, dtype=jnp.int32)).astype(jnp.int32)
    cnt = start[1:] - start[:-1]
    grid = jnp.arange(bcap, dtype=jnp.int32)[None, :]
    src = start[:-1][:, None] + grid                 # (n_dest, bcap)
    in_run = grid < cnt[:, None]
    flat = jnp.clip(src.reshape(-1), 0, m - 1)

    def pack(p, fill):
        v = p[flat]
        v = jnp.where(in_run.reshape(-1), v, fill)
        return v.reshape(n_dest, bcap)

    out = tuple(pack(p, -1) for p in s_payloads)
    return out, cnt, start, s_owner, s_slot


def _unbucket(resp, start, s_owner, s_slot, m, bcap, fill):
    """Distribute per-destination responses back to query slots.

    resp: (n_dest, bcap) response for my j-th query to owner d at
    [d, j].  Returns (m,) in original query order; queries whose rank
    overflowed bcap get `fill`.
    """
    pos = jnp.arange(m, dtype=jnp.int32)
    rank = pos - start[jnp.clip(s_owner, 0, start.shape[0] - 2)]
    ok = (rank < bcap) & (s_owner < start.shape[0] - 1)
    flat_idx = jnp.clip(s_owner, 0, start.shape[0] - 2) * bcap + \
        jnp.clip(rank, 0, bcap - 1)
    got = jnp.where(ok, resp.reshape(-1)[flat_idx], fill)
    # restore original order
    out = jnp.zeros(m, got.dtype).at[s_slot].set(got)
    return out


def make_gather(mesh: Mesh, cap_local: int, m_local: int, bcap: int,
                n_fields: int = 1):
    """fn(x (D, cap_local, F) int32, idx (D, m_local) global or <0)
    -> (vals (D, m_local, F) int32 with -1 fill, dropped (D,))."""
    d = mesh.shape[AXIS]

    def step(x, idx):
        x = _squeeze(x)            # (cap, F)
        idx = _squeeze(idx)        # (m,)
        me = jax.lax.axis_index(AXIS).astype(jnp.int32)
        owner = jnp.where(idx >= 0, idx // cap_local, d)
        off = jnp.where(idx >= 0, idx % cap_local, 0)
        # self-owned queries answer locally and never touch a bucket —
        # in pointer-doubling most lanes point at themselves, which
        # would otherwise concentrate the whole batch in one bucket
        is_self = owner == me
        self_vals = jnp.where(
            (is_self & (idx >= 0))[:, None],
            x[jnp.where(is_self, off, 0)], -1)
        owner = jnp.where(is_self, d, owner)
        (req,), cnt, start, s_owner, s_slot = _bucket_by_owner(
            owner, d, bcap, off)
        dropped = jnp.sum(jnp.maximum(cnt - bcap, 0))
        recv = jax.lax.all_to_all(
            req.reshape(d, bcap, 1), AXIS, split_axis=0, concat_axis=0,
            tiled=False).reshape(d, bcap)
        # answer: local gather (mask invalid requests)
        vals = x[jnp.clip(recv.reshape(-1), 0, cap_local - 1)]
        vals = jnp.where((recv.reshape(-1) >= 0)[:, None], vals, -1)
        back = jax.lax.all_to_all(
            vals.reshape(d, bcap, n_fields), AXIS, split_axis=0,
            concat_axis=0, tiled=False)               # (d, bcap, F)
        outs = []
        for f in range(n_fields):
            routed = _unbucket(back[..., f], start, s_owner, s_slot,
                               idx.shape[0], bcap, jnp.int32(-1))
            outs.append(jnp.where(is_self, self_vals[:, f], routed))
        return (jnp.stack(outs, axis=-1)[None], dropped[None])

    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS, None, None), P(AXIS, None)),
        out_specs=(P(AXIS, None, None), P(AXIS)))
    return jax.jit(mapped)


def make_scatter(mesh: Mesh, cap_local: int, m_local: int, bcap: int,
                 op: str = "add", n_fields: int = 1):
    """fn(idx (D, m_local) global or <0, vals (D, m_local, F) int32)
    -> (acc (D, cap_local, F), dropped (D,)).  op: add | max | or."""
    d = mesh.shape[AXIS]

    def step(idx, vals):
        idx = _squeeze(idx)
        vals = _squeeze(vals)       # (m, F)
        me = jax.lax.axis_index(AXIS).astype(jnp.int32)
        owner = jnp.where(idx >= 0, idx // cap_local, d)
        off = jnp.where(idx >= 0, idx % cap_local, 0)
        # self-owned records fold in locally (see make_gather)
        is_self = (owner == me) & (idx >= 0)
        owner = jnp.where(is_self, d, owner)
        payloads = (off,) + tuple(vals[:, f] for f in range(n_fields))
        buckets, cnt, _start, _so, _ss = _bucket_by_owner(
            owner, d, bcap, *payloads)
        dropped = jnp.sum(jnp.maximum(cnt - bcap, 0))
        send = jnp.stack(buckets, axis=-1)  # (d, bcap, 1+F)
        recv = jax.lax.all_to_all(
            send, AXIS, split_axis=0, concat_axis=0, tiled=False)
        r_off = jnp.concatenate(
            [recv[..., 0].reshape(-1), jnp.where(is_self, off, -1)])
        r_vals = jnp.concatenate(
            [recv[..., 1:].reshape(-1, n_fields),
             jnp.where(is_self[:, None], vals, -1)])
        valid = r_off >= 0
        tgt = jnp.where(valid, r_off, cap_local)
        if op == "add":
            acc = jnp.zeros((cap_local + 1, n_fields), jnp.int32)
            acc = acc.at[tgt].add(
                jnp.where(valid[:, None], r_vals, 0), mode="drop")
        elif op == "max":
            acc = jnp.full((cap_local + 1, n_fields), _NEG)
            acc = acc.at[tgt].max(
                jnp.where(valid[:, None], r_vals, _NEG), mode="drop")
        elif op == "or":
            acc = jnp.zeros((cap_local + 1, n_fields), jnp.int32)
            acc = acc.at[tgt].max(
                jnp.where(valid[:, None], r_vals, 0), mode="drop")
        else:
            raise ValueError(op)
        return acc[:cap_local][None], dropped[None]

    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None, None)),
        out_specs=(P(AXIS, None, None), P(AXIS)))
    return jax.jit(mapped)


def make_lookup(mesh: Mesh, k: int, cap_local: int, m_local: int,
                bcap: int):
    """fn(keys (D, cap, W), n (D,), deleted (D, cap) int32,
    queries (D, m, W) uint32) -> (rows (D, m) GLOBAL id or -1,
    dropped (D,)).  Dead rows (>= n or deleted) answer -1."""
    from . import sharded_count

    d = mesh.shape[AXIS]
    w = bits.words_for_k(k)
    bounds = sharded_count._owner_boundaries(k, d)

    def step(keys, n, deleted, queries):
        keys = _squeeze(keys)
        deleted = _squeeze(deleted)
        q = _squeeze(queries)       # (m, W)
        n_live = n.reshape(())
        m = q.shape[0]
        sentinel = jnp.all(q == jnp.uint32(0xFFFFFFFF), axis=-1)
        me = jax.lax.axis_index(AXIS).astype(jnp.int32)
        owner = jnp.sum(
            q[:, 0:1] >= jnp.asarray(bounds)[None, :], axis=1
        ).astype(jnp.int32)
        owner = jnp.where(sentinel, d, owner)
        is_self = owner == me  # answered locally, skip the buckets
        owner = jnp.where(is_self, d, owner)
        payloads = tuple(q[:, i].astype(jnp.int32) for i in range(w))
        buckets, cnt, start, s_owner, s_slot = _bucket_by_owner(
            owner, d, bcap, *payloads)
        dropped = jnp.sum(jnp.maximum(cnt - bcap, 0))
        send = jnp.stack(buckets, axis=-1)  # (d, bcap, W)
        recv = jax.lax.all_to_all(
            send, AXIS, split_axis=0, concat_axis=0, tiled=False)
        rq = jnp.concatenate(
            [recv.reshape(-1, w),
             jnp.where(is_self[:, None], q.astype(jnp.int32), -1)]
        ).astype(jnp.uint32)
        # unrolled branchless bisection (the fori_loop version trips
        # shard_map's varying-carry check; cap is small enough that
        # ~log2(cap) unrolled steps compile fine)
        mq = rq.shape[0]
        lo = jnp.zeros(mq, jnp.int32)
        hi = jnp.full(mq, cap_local, jnp.int32)
        for _ in range(int(cap_local).bit_length()):
            live_q = lo < hi
            mid = (lo + hi) >> 1
            row_k = keys[jnp.clip(mid, 0, cap_local - 1)]
            less = bits.lex_less(row_k, rq)
            lo = jnp.where(live_q & less, mid + 1, lo)
            hi = jnp.where(live_q & ~less, mid, hi)
        found = keys[jnp.clip(lo, 0, cap_local - 1)]
        hit = (lo < cap_local) & bits.lex_eq(found, rq)
        rows = jnp.where(hit, lo, -1)
        alive = (rows >= 0) & (rows < n_live) & \
            (deleted[jnp.clip(rows, 0)] == 0)
        rows = jnp.where(alive, rows + me * cap_local, -1)
        routed_rows, self_rows = rows[: d * bcap], rows[d * bcap:]
        back = jax.lax.all_to_all(
            routed_rows.reshape(d, bcap, 1), AXIS, split_axis=0,
            concat_axis=0, tiled=False).reshape(d, bcap)
        out = _unbucket(back, start, s_owner, s_slot, m, bcap,
                        jnp.int32(-1))
        out = jnp.where(is_self, self_rows, out)
        return out[None], dropped[None]

    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS, None, None), P(AXIS), P(AXIS, None),
                  P(AXIS, None, None)),
        out_specs=(P(AXIS, None), P(AXIS)))
    return jax.jit(mapped)


class Router:
    """Compiled-primitive cache with overflow retry.

    Primitives are keyed by (kind, static shape, bcap); on bucket
    overflow the call transparently retries with a doubled bucket
    (recompiling once per growth step, like the counting driver)."""

    def __init__(self, mesh: Mesh, cap_local: int):
        self.mesh = mesh
        self.cap = cap_local
        self.d = mesh.shape[AXIS]
        self._fns = {}

    def _bcap0(self, m_local: int) -> int:
        return max(128, (2 * m_local) // self.d)

    def _get(self, kind, m_local, bcap, **kw):
        key = (kind, m_local, bcap, tuple(sorted(kw.items())))
        if key not in self._fns:
            if kind == "gather":
                self._fns[key] = make_gather(
                    self.mesh, self.cap, m_local, bcap, **kw)
            elif kind == "scatter":
                self._fns[key] = make_scatter(
                    self.mesh, self.cap, m_local, bcap, **kw)
            elif kind == "lookup":
                self._fns[key] = make_lookup(
                    self.mesh, kw.pop("k"), self.cap, m_local, bcap)
            else:
                raise ValueError(kind)
        return self._fns[key]

    def _retry(self, kind, m_local, args, **kw):
        bcap = self._bcap0(m_local)
        while True:
            out, dropped = self._get(kind, m_local, bcap, **kw)(*args)
            n_drop = int(jnp.sum(dropped))
            if n_drop == 0:
                return out
            bcap = min(2 * bcap, m_local)
            print(f"[sharded_graph] {kind} bucket overflow "
                  f"({n_drop}) — retrying with bcap={bcap}")

    def gather(self, x, idx, n_fields: int = 1):
        """x: (D, cap, F) int32 sharded; idx: (D, m) global ids."""
        return self._retry("gather", idx.shape[1], (x, idx),
                           n_fields=n_fields)

    def gather1(self, x, idx):
        """x: (D, cap) -> (D, m) single-field gather."""
        return self.gather(x[..., None], idx)[..., 0]

    def scatter(self, idx, vals, op="add", n_fields: int = 1):
        return self._retry("scatter", idx.shape[1], (idx, vals),
                           op=op, n_fields=n_fields)

    def scatter1(self, idx, vals, op="add"):
        return self.scatter(idx, vals[..., None], op=op)[..., 0]

    def lookup(self, keys, n, deleted, queries, k: int):
        """Route multiword key queries to owners; -1 for missing/dead.

        keys (D, cap, W) uint32, n (D,), deleted (D, cap) int32,
        queries (D, m, W) uint32 -> (D, m) global row ids.
        """
        return self._retry("lookup", queries.shape[1],
                           (keys, n, deleted, queries), k=k)


def sharded_list_rank(router: Router, prev, exists):
    """Pointer-doubling chain ranking over a sharded id space — the
    mesh twin of ops/ranking.list_rank (cycles broken at min id).

    prev: (D, m) global predecessor ids or -1; exists: (D, m) bool.
    Returns (head (D, m) global, rank (D, m), is_head (D, m) bool).
    """
    d, m = prev.shape
    n_total = d * m
    steps = max(1, int(n_total).bit_length())
    self_idx = (jnp.arange(n_total, dtype=jnp.int32).reshape(d, m))

    # pass 1: cycle detection + min-id propagation (parent pointers
    # are always valid ids, so gathers never miss)
    parent = jnp.where(prev >= 0, prev, self_idx)
    mn = self_idx
    for _ in range(steps):
        got = router.gather(
            jnp.stack([parent, mn], axis=-1), parent, n_fields=2)
        mn = jnp.minimum(mn, got[..., 1])
        parent = got[..., 0]
    prev_at_parent = router.gather1(prev, parent)
    on_cycle = exists & (prev_at_parent >= 0)
    prev = jnp.where(on_cycle & (mn == self_idx), -1, prev)

    # pass 2: ranking with heads fixed
    parent = jnp.where(prev >= 0, prev, self_idx)
    rank = jnp.where(prev >= 0, 1, 0).astype(jnp.int32)
    for _ in range(steps):
        got = router.gather(
            jnp.stack([parent, rank], axis=-1), parent, n_fields=2)
        rank = rank + got[..., 1]
        parent = got[..., 0]
    is_head = exists & (prev < 0)
    return parent, rank, is_head
