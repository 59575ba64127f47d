"""De Bruijn graph over the canonical k-mer table: directed-node view.

The reference's implicit de Bruijn graph lives in per-k-mer 4x6-bit
left/right coverage counters plus linear/deleted flags
(src/inc/newhash.h:65-77, Mark1in1outNode src/cutTipPreGraph.c:1129).
Walks chase pointers via hash lookups one node at a time.

TPU-native view: canonical k-mer row i yields TWO directed nodes,
``u = 2*i + s`` (s=0: canonical orientation, s=1: reverse
complement); ``twin(u) = u ^ 1``.  All graph state is dense arrays
indexed by u:

* ``out_cov[u, b]``  — coverage of the arc extending u's oriented
  k-mer by base b on the right (s=0: r_cov row; s=1: l_cov row with
  complemented base).
* ``succ[u, b]``     — directed node id of that extension's target
  (or -1), resolved with ONE batched dictionary lookup for all
  2*cap*4 candidates at once.

Twin symmetry kills the need for predecessor tables:
``pred(u, b) = twin(succ(twin(u), comp(b)))`` and
``in_deg(u) = out_deg(twin(u))`` — each read occurrence increments
the same counter seen from both sides, so arc existence is
twin-symmetric.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import bits, dictionary


class DBG(NamedTuple):
    """Directed-node graph state derived from a KmerTable."""

    out_cov: jnp.ndarray   # (8*cap,) int32, arc-flat (u*4 + b)
    succ: jnp.ndarray      # (8*cap,) int32 directed id or -1, arc-flat
    exists: jnp.ndarray    # (8*cap,) bool, arc-flat
    # arc-granular state is FLAT: (N, 2/4)-shaped stacks, interleaves,
    # gathers and pair-reverses crash the TPU compile helper above
    # ~16M rows.  Arc id a = u*4 + b indexes directly; the twin node's
    # arc is a ^ 4; per-base columns are x[b::4]
    out_deg: jnp.ndarray   # (2*cap,) int32
    linear: jnp.ndarray    # (2*cap,) bool — 1-in-1-out node
    first_base: jnp.ndarray  # (2*cap,) uint8 first base of oriented kmer
    live: jnp.ndarray      # (2*cap,) bool — row exists and not deleted


def twin(u):
    return u ^ 1


def row_of(u):
    return u >> 1


_CHUNK_ROWS = 1 << 20     # table rows per resolution chunk (x8 queries)


@functools.partial(jax.jit, static_argnums=(2,))
def _resolve_keys_chunk(keys_full, kchunk, k: int):
    """Successor-candidate resolution for one chunk of table rows:
    orient (fwd + revcomp), extend by every base, canonicalize, one
    batched lookup into the FULL key array."""
    rc = bits.reverse_complement(kchunk, k)
    w = kchunk.shape[-1]
    ori = jnp.stack([kchunk, rc], axis=1).reshape(-1, w)
    m = ori.shape[0]
    base4 = jnp.arange(4, dtype=jnp.uint32)
    ext = bits.next_kmer(
        jnp.broadcast_to(ori[:, None, :], (m, 4, w)),
        jnp.broadcast_to(base4, (m, 4)), k)
    can, use_rc = bits.canonical(ext.reshape(-1, w), k)
    rows = dictionary.lookup(keys_full, can)
    return rows, use_rc


@functools.partial(jax.jit, static_argnums=(3,))
def _dbg_finish(table: dictionary.KmerTable, rows, use_rc, k: int):
    """All arc-granular state is FLAT (8cap,) with 1-D strided ops:
    at 16.7M+ rows the TPU compile helper rejects programs staging
    (N, 2/4)-shaped int32 interleaves/stacks/gathers (bool (N, 4)
    outputs are fine, so `exists` stays 2-D for consumers)."""
    cap = table.capacity
    two_cap = 2 * cap
    keys = table.keys
    rc = bits.reverse_complement(keys, k)
    oriented = bits.interleave2(keys, rc)
    live_row = (jnp.arange(cap) < table.n) & (~table.deleted)
    live = jnp.repeat(live_row, 2)
    # node-major flat coverage: slot 8i+b <- r_cov[i, b] (fwd node),
    # 8i+4+b <- l_cov[i, comp(b)] (rc node); comp(b) = b^2
    out_cov = jnp.zeros(8 * cap, jnp.int32)
    comp = (2, 3, 0, 1)
    for b in range(4):
        out_cov = out_cov.at[b::8].set(table.r_cov[:, b])
        out_cov = out_cov.at[4 + b::8].set(table.l_cov[:, comp[b]])

    succ_f = jnp.where(rows >= 0, 2 * rows + use_rc.astype(jnp.int32),
                       -1)[: two_cap * 4]
    succ_live_f = jnp.where(succ_f >= 0, live[jnp.clip(succ_f, 0)],
                            False)
    exists_f = (out_cov > 0) & succ_live_f & jnp.repeat(live, 4)
    succ_f = jnp.where(exists_f, succ_f, jnp.where(
        succ_f >= 0, succ_f, -1))
    e32 = exists_f.astype(jnp.int32)
    out_deg = e32[0::4] + e32[1::4] + e32[2::4] + e32[3::4]
    # in_deg[u] = out_deg[twin(u)]: 1-D XOR gather — the
    # reshape(-1,2)[:, ::-1] spelling fails to compile after strided
    # slice producers at this size
    in_deg = out_deg[jnp.arange(two_cap, dtype=jnp.int32) ^ 1]
    linear = (out_deg == 1) & (in_deg == 1) & live
    fb = bits.first_base(oriented, k)
    return DBG(out_cov, succ_f, exists_f, out_deg, linear, fb, live)


def build_dbg(table: dictionary.KmerTable, k: int) -> DBG:
    """Resolve all successor candidates and mark linear nodes.

    Equivalent of the reference's per-node l_links/r_links +
    Mark1in1outNode pass, with neighbor resolution done as batched
    binary-search lookups.  HOST-orchestrated: candidate resolution
    runs in fixed-size row chunks (one cached jit, called per chunk)
    — a single whole-table query program exceeds HBM above ~4M rows.
    Chunking by table row keeps global node order: row i contributes
    nodes 2i, 2i+1 consecutively in every chunk.
    """
    cap = table.capacity
    if cap <= 2 * _CHUNK_ROWS:
        rows, use_rc = _resolve_keys_chunk(table.keys, table.keys, k)
    else:
        w = table.keys.shape[-1]
        parts = []
        for off in range(0, cap, _CHUNK_ROWS):
            kchunk = table.keys[off:off + _CHUNK_ROWS]
            if kchunk.shape[0] < _CHUNK_ROWS:
                pad = _CHUNK_ROWS - kchunk.shape[0]
                kchunk = jnp.concatenate(
                    [kchunk,
                     jnp.full((pad, w), 0xFFFFFFFF, jnp.uint32)])
            parts.append(_resolve_keys_chunk(table.keys, kchunk, k))
        rows = jnp.concatenate([r for r, _ in parts])
        use_rc = jnp.concatenate([u for _, u in parts])
    return _dbg_finish(table, rows, use_rc, k)


def arc_id(u, b):
    """Dense arc index: arc (u, b) -> u*4 + b."""
    return (u << 2) | b


def twin_arc(dbg: DBG, a):
    """Twin of arc a = (u, b):  twin(succ(u,b)) --comp(first_base(u))-->.

    The reverse-complement walk traverses the same unitig backwards;
    this is the reference's bal_edge/bal_arc duality (src/arc.c,
    loadPreGraph.c:543) expressed as pure index arithmetic.
    """
    u = a >> 2
    v = dbg.succ[a]          # succ is arc-flat: index == arc id
    fb = dbg.first_base[u].astype(jnp.int32)
    return jnp.where(v >= 0, arc_id(twin(v), fb ^ 2), -1)
