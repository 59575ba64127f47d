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

    out_cov: jnp.ndarray   # (2*cap, 4) int32
    succ: jnp.ndarray      # (2*cap, 4) int32 directed id or -1
    exists: jnp.ndarray    # (2*cap, 4) bool — arc present
    out_deg: jnp.ndarray   # (2*cap,) int32
    linear: jnp.ndarray    # (2*cap,) bool — 1-in-1-out node
    first_base: jnp.ndarray  # (2*cap,) uint8 first base of oriented kmer
    live: jnp.ndarray      # (2*cap,) bool — row exists and not deleted


def twin(u):
    return u ^ 1


def row_of(u):
    return u >> 1


@functools.partial(jax.jit, static_argnums=(1,))
def build_dbg(table: dictionary.KmerTable, k: int) -> DBG:
    """Resolve all successor candidates and mark linear nodes.

    Equivalent of the reference's per-node l_links/r_links +
    Mark1in1outNode pass, with neighbor resolution done as one
    batched binary-search lookup instead of per-walk hash probes.
    """
    cap = table.capacity
    keys = table.keys
    rc = bits.reverse_complement(keys, k)

    # oriented[u] : (2cap, W) — interleaved fwd/rc
    oriented = jnp.stack([keys, rc], axis=1).reshape(2 * cap, -1)

    live_row = (jnp.arange(cap) < table.n) & (~table.deleted)
    live = jnp.repeat(live_row, 2)

    # out_cov: s=0 -> r_cov[row][b];  s=1 -> l_cov[row][b^2]
    l_cov = table.l_cov
    r_cov = table.r_cov
    rev_l = l_cov[:, jnp.asarray([2, 3, 0, 1])]  # b -> comp(b) = b^2
    out_cov = jnp.stack([r_cov, rev_l], axis=1).reshape(2 * cap, 4)

    # successor candidates: extend every oriented kmer by every base.
    # Above ~4M nodes the (8cap, W)-query lookup's temporaries exceed
    # HBM (observed: a 32 GB fusion at a 16.7M-row table on a 16 GB
    # chip), so big tables resolve in fixed-size chunks under lax.map
    # — sequential in the chunk axis, identical results.
    base4 = jnp.arange(4, dtype=jnp.uint32)
    w = oriented.shape[-1]
    two_cap = 2 * cap

    def _resolve(ori):
        m = ori.shape[0]
        ext = bits.next_kmer(
            jnp.broadcast_to(ori[:, None, :], (m, 4, w)),
            jnp.broadcast_to(base4, (m, 4)), k)
        can, use_rc = bits.canonical(ext.reshape(-1, w), k)
        rows = dictionary.lookup(keys, can)
        return rows, use_rc

    chunk = 1 << 21
    if two_cap > chunk * 2:
        pad = (-two_cap) % chunk
        ori_p = oriented if not pad else jnp.concatenate(
            [oriented, jnp.full((pad, w), 0xFFFFFFFF, jnp.uint32)])
        rows_c, rc_c = jax.lax.map(
            _resolve, ori_p.reshape(-1, chunk, w))
        rows = rows_c.reshape(-1)[: two_cap * 4]
        use_rc = rc_c.reshape(-1)[: two_cap * 4]
    else:
        rows, use_rc = _resolve(oriented)
    succ_f = jnp.where(rows >= 0, 2 * rows + use_rc.astype(jnp.int32),
                       -1)
    # gather liveness on the FLAT axis ((N, 4)-output gathers can get
    # a minor-dim-padded layout: 32x HLO-temp blowup at big tables)
    succ_live = jnp.where(succ_f >= 0, live[jnp.clip(succ_f, 0)],
                          False).reshape(two_cap, 4)
    succ = succ_f.reshape(two_cap, 4)
    exists = (out_cov > 0) & succ_live & live[:, None]
    out_deg = jnp.sum(exists.astype(jnp.int32), axis=1)
    in_deg = out_deg.reshape(cap, 2)[:, ::-1].reshape(2 * cap)  # deg of twin
    linear = (out_deg == 1) & (in_deg == 1) & live

    fb = bits.first_base(oriented, k)
    return DBG(out_cov, succ, exists, out_deg, linear, fb, live)


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
    b = a & 3
    v = dbg.succ[u, b]
    fb = dbg.first_base[u].astype(jnp.int32)
    return jnp.where(v >= 0, arc_id(twin(v), fb ^ 2), -1)
