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


def list_rank(prev: jnp.ndarray, exists: jnp.ndarray):
    """prev[i] = predecessor id or -1.  Returns (head, rank, is_head).

    head[i]: first element of i's chain; rank[i]: distance from head;
    is_head: exists & (effective prev == -1, after cycle breaking).
    Elements with exists=False must have prev == -1 and are ignored.
    """
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
