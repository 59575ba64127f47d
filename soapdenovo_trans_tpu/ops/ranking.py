"""Parallel list ranking with cycle breaking.

Shared machinery for every "walk the linked chain" pass in the
reference (unitig condensation node2edge.c, edge concatenation
concatenateEdge.c:227-296, scaffold linearization): given a backward
pointer per element, compute each element's chain head and rank in
O(log n) gather rounds via pointer doubling.  Closed cycles — which
the reference's serial walks either cannot reach or special-case —
are broken at their minimum element id.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Above this element count the FUSED ranking program (all O(log n)
# pointer-doubling rounds in one XLA program) kernel-faults the TPU
# worker (isolated 2026-08-21 on the 500k-pair e2e run: passes at
# n=26.3M, faults at n=2^25 with identical math, while single
# 33.5M-row gathers in neighboring programs run fine — it is the
# 25-round fused loop, not any one gather).  Beyond the threshold,
# run each pointer-doubling round as its own jitted program: same
# round count, ~50 extra dispatches, no fused megaloop.  Host-level
# callers get this automatically from list_rank; callers that trace
# list_rank inside a LARGER jit must hoist it out above this size
# (see unitigs._arc_arrays).
STEPWISE_N = 1 << 24


@jax.jit
def _det_step(parent, mn):
    return parent[parent], jnp.minimum(mn, mn[parent])


@jax.jit
def _rank_step(parent, rank):
    return parent[parent], rank + rank[parent]


@jax.jit
def _break_cycles(prev, exists, parent, mn):
    self_idx = jnp.arange(prev.shape[0], dtype=jnp.int32)
    on_cycle = exists & (prev[parent] >= 0)
    prev = jnp.where(on_cycle & (mn == self_idx), -1, prev)
    parent = jnp.where(prev >= 0, prev, self_idx)
    rank = jnp.where(prev >= 0, 1, 0).astype(jnp.int32)
    return prev, parent, rank


@jax.jit
def _init_parent(prev):
    self_idx = jnp.arange(prev.shape[0], dtype=jnp.int32)
    return jnp.where(prev >= 0, prev, self_idx), self_idx


def _list_rank_fused(prev: jnp.ndarray, exists: jnp.ndarray):
    """Single-program form — traceable inside other jits; must stay
    below STEPWISE_N elements on the TPU backend (see above)."""
    n = prev.shape[0]
    steps = max(1, n.bit_length())
    self_idx = jnp.arange(n, dtype=jnp.int32)

    # pass 1: cycle detection (chains converge to a head whose prev is
    # -1; cycle members always see a live predecessor — note an
    # even-length cycle's doubled pointer converges to SELF, so a
    # parent==parent[parent] test would misclassify it) + min-id.
    parent = jnp.where(prev >= 0, prev, self_idx)
    mn = self_idx

    def det(i, carry):
        parent, mn = carry
        mn = jnp.minimum(mn, mn[parent])
        return parent[parent], mn

    parent, mn = jax.lax.fori_loop(0, steps, det, (parent, mn))
    on_cycle = exists & (prev[parent] >= 0)
    prev = jnp.where(on_cycle & (mn == self_idx), -1, prev)

    # pass 2: ranking with heads fixed
    parent = jnp.where(prev >= 0, prev, self_idx)
    rank = jnp.where(prev >= 0, 1, 0).astype(jnp.int32)

    def body(i, carry):
        parent, rank = carry
        rank = rank + rank[parent]
        return parent[parent], rank

    parent, rank = jax.lax.fori_loop(0, steps, body, (parent, rank))
    is_head = exists & (prev < 0)
    return parent, rank, is_head


_fused_jit = jax.jit(_list_rank_fused)


def list_rank(prev: jnp.ndarray, exists: jnp.ndarray):
    """prev[i] = predecessor id or -1.  Returns (head, rank, is_head).

    head[i]: first element of i's chain; rank[i]: distance from head;
    is_head: exists & (effective prev == -1, after cycle breaking).
    Elements with exists=False must have prev == -1 and are ignored.

    Inside an outer jit trace this inlines the fused form (caller is
    responsible for staying under STEPWISE_N there); at host level it
    switches to per-round programs above STEPWISE_N.
    """
    if isinstance(prev, jax.core.Tracer):
        return _list_rank_fused(prev, exists)
    n = prev.shape[0]
    if n < STEPWISE_N:
        return _fused_jit(prev, exists)

    steps = max(1, n.bit_length())
    parent, mn = _init_parent(prev)
    for _ in range(steps):
        parent, mn = _det_step(parent, mn)
    prev, parent, rank = _break_cycles(prev, exists, parent, mn)
    for _ in range(steps):
        parent, rank = _rank_step(parent, rank)
    is_head = exists & (prev < 0)
    return parent, rank, is_head
