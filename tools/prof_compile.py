"""Compile-time scaling bisection: which part of thread_reads compiles
superlinearly with the row count on the TPU backend?

AOT-lowers and compiles (a) the full arcs.thread_reads, (b) the local
path-slot logic only (no table lookups), (c) the sort-join lookup
alone, (d) the patch bisect lookup alone — each at growing row
counts, printing wall-clock compile seconds.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from soapdenovo_trans_tpu.graph import arcs as arcs_mod
from soapdenovo_trans_tpu.graph import unitigs
from soapdenovo_trans_tpu.ops import dictionary

K = 23
L = 100
P = L - K + 1

CAP = 1 << 20       # table capacity (1M) — run cost, not compile cost
PCAP = 1 << 14


def mk_table(cap):
    keys = jnp.zeros((cap, 2), jnp.uint32)
    return dictionary.KmerTable(
        keys, jnp.zeros(cap, jnp.int32), jnp.zeros((cap, 4), jnp.int32),
        jnp.zeros((cap, 4), jnp.int32), jnp.int32(cap),
        jnp.zeros(cap, bool))


def mk_eg(n):
    z = jnp.zeros(n, jnp.int32)
    return unitigs.EdgeGraph(
        from_node=z, to_node=z, length=jnp.ones(n, jnp.int32),
        cvg=z, twin=jnp.arange(n, dtype=jnp.int32),
        seq_off=z, seq_pool=jnp.zeros(1024, jnp.uint8),
        n_edges=jnp.int32(n), node_edge=jnp.zeros(2 * CAP, jnp.int32),
        node_pos=jnp.zeros(2 * CAP, jnp.int32),
        deleted=jnp.zeros(n, bool))


def timed_compile(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_comp = time.time() - t0
    print(f"  {name}: lower {t_lower:.1f}s compile {t_comp:.1f}s",
          flush=True)


def main():
    print(f"backend: {jax.default_backend()}")
    table = mk_table(CAP)
    patch = arcs_mod.PatchTable(
        jnp.zeros((PCAP, 2), jnp.uint32), jnp.zeros(PCAP, jnp.int32),
        jnp.int32(PCAP))

    try:
        eg = mk_eg(1 << 16)
    except TypeError:
        # EdgeGraph signature drift — build positionally from fields
        import inspect
        print(inspect.signature(unitigs.EdgeGraph))
        raise

    for r in (4096, 16384, 65536):
        print(f"r={r}:")
        seqs = jnp.zeros((r, L), jnp.uint8)
        lengths = jnp.full(r, L, jnp.int32)

        def full(s, ln):
            return arcs_mod.thread_reads(s, ln, table, eg, patch, K)

        timed_compile("full thread_reads", full, seqs, lengths)

        m = r * P

        def sortjoin(q):
            return dictionary._lookup_sortjoin(table.keys, q)

        timed_compile("sortjoin lookup", sortjoin,
                      jnp.zeros((m, 2), jnp.uint32))

        def bisect(q):
            return dictionary._lookup_bisect(patch.keys, q)

        timed_compile("bisect lookup", bisect,
                      jnp.zeros((m, 2), jnp.uint32))

        def local_logic(eid_flat, valid, lengths):
            eid = jnp.where(valid, eid_flat, -1)
            interior = (eid >= 0).reshape(r, P)
            eid2 = eid.reshape(r, P)
            slots_e = jnp.full((r, 2 * P), -1, jnp.int32)
            prev_same = jnp.concatenate(
                [jnp.zeros((r, 1), bool),
                 interior[:, :-1] & (eid2[:, :-1] == eid2[:, 1:])], axis=1)
            is_entry = interior & ~prev_same
            slots_e = slots_e.at[:, 0::2].set(jnp.where(is_entry, eid2, -1))
            slot_idx = jnp.arange(2 * P, dtype=jnp.int32)
            entry_here = slots_e >= 0
            marked = jnp.where(entry_here, slot_idx, -1)
            prev_incl = jax.lax.associative_scan(
                jnp.maximum, marked, axis=1)
            prev_entry = jnp.concatenate(
                [jnp.full((r, 1), -1, jnp.int32), prev_incl[:, :-1]],
                axis=1)
            ps = jnp.clip(prev_entry, 0)
            prev_val = jnp.take_along_axis(slots_e, ps, axis=1)
            bar = jnp.cumsum((slots_e < 0).astype(jnp.int32), axis=1)
            bar_at = jnp.take_along_axis(bar, ps, axis=1)
            ok = entry_here & (prev_entry >= 0) & (bar - bar_at == 0)
            return prev_val.reshape(-1), slots_e.reshape(-1), ok.reshape(-1)

        timed_compile("local path logic", local_logic,
                      jnp.zeros(m, jnp.int32), jnp.zeros(m, bool),
                      lengths)

        from soapdenovo_trans_tpu.stages import map as map_stage

        def vote_only(ctg_of, kpos, src, wrc, ln):
            return map_stage.vote(
                ctg_of, kpos, src, wrc, ln,
                jnp.zeros(1 << 16, jnp.int32),
                jnp.arange(1 << 16, dtype=jnp.int32), K, 32)

        timed_compile(
            "map vote", vote_only,
            jnp.zeros((r, P), jnp.int32), jnp.zeros((r, P), jnp.int32),
            jnp.zeros((r, P), bool), jnp.zeros((r, P), bool), lengths)


if __name__ == "__main__":
    main()
