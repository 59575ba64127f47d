import sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_sdt_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from soapdenovo_trans_tpu.ops import dictionary, ranking
from soapdenovo_trans_tpu.graph import dbg as dbg_mod

CAP = 16 * (1 << 20)
K = 23
rng = np.random.default_rng(0)
raw = np.sort(rng.choice(2**52, size=CAP, replace=False).astype(np.uint64))
keys = np.stack([(raw >> 32).astype(np.uint32),
                 (raw & 0xFFFFFFFF).astype(np.uint32)], axis=1)
table = dictionary.KmerTable(
    jnp.asarray(keys), jnp.ones(CAP, jnp.int32),
    jnp.asarray(rng.integers(0, 3, size=(CAP, 4), dtype=np.int64).astype(np.int32)),
    jnp.asarray(rng.integers(0, 3, size=(CAP, 4), dtype=np.int64).astype(np.int32)),
    jnp.int32(CAP - 5), jnp.zeros(CAP, bool))
graph = dbg_mod.build_dbg(table, K)
two_cap = 2 * CAP
nodes_h = np.arange(two_cap, dtype=np.int32)
# fabricate plausible step outputs
head = jnp.asarray(nodes_h)  # each its own head
rank = jnp.zeros(two_cap, jnp.int32)
on_tip = jnp.asarray(rng.random(two_cap) < 0.01)
chain_len = jnp.where(on_tip, 1, 0)

import functools
@functools.partial(jax.jit, static_argnums=(6,))
def stepD(table, graph, head, rank, on_tip, chain_len, k):
    cap = table.capacity
    two_cap = 2 * cap
    nodes = jnp.arange(two_cap, dtype=jnp.int32)
    in_deg = graph.out_deg[nodes ^ 1]
    ex = graph.exists
    e0, e1, e2, e3 = ex[0::4], ex[1::4], ex[2::4], ex[3::4]
    len_at_head = jnp.where(head >= 0, chain_len[jnp.clip(head, 0)], 0)
    is_last = on_tip & (rank == len_at_head - 1)
    lb = jnp.where(e0, 0, jnp.where(e1, 1, jnp.where(e2, 2, 3))).astype(jnp.int32)
    join = jnp.where(is_last, graph.succ[4 * nodes + lb], -1)
    join_cov = jnp.where(is_last, graph.out_cov[4 * nodes + lb], 0)
    join_tw = jnp.clip(join, 0) ^ 1
    oc = graph.out_cov
    jt4 = 4 * join_tw
    join_max_in = jnp.maximum(jnp.maximum(oc[jt4], oc[jt4 + 1]),
                              jnp.maximum(oc[jt4 + 2], oc[jt4 + 3]))
    join_in_deg = jnp.where(join >= 0, in_deg[jnp.clip(join, 0)], 0)
    join_out_deg = jnp.where(join >= 0, graph.out_deg[jnp.clip(join, 0)], 0)
    join_dangling = is_last & (join >= 0) & (join_in_deg + join_out_deg == 1)
    clip_here = is_last & (join >= 0) & (join_dangling | (join_cov < join_max_in))
    clip_here = clip_here | (is_last & (join < 0))
    clip_at_head = jnp.zeros(two_cap + 1, bool).at[
        jnp.where(clip_here, head, two_cap)].set(True, mode="drop")[:two_cap]
    ok_head = clip_at_head & (chain_len <= 2 * k)
    doomed = on_tip & jnp.where(head >= 0, ok_head[jnp.clip(head, 0)], False)
    join_doomed_at = jnp.where(
        join_dangling & jnp.where(head >= 0, ok_head[jnp.clip(head, 0)], False), join, -1)
    hits = jnp.zeros(cap + 1, bool)
    hits = hits.at[jnp.where(doomed, nodes >> 1, cap)].set(True, mode="drop")
    hits = hits.at[jnp.where(join_doomed_at >= 0, join_doomed_at >> 1, cap)].set(True, mode="drop")
    hits = hits[:cap]
    new_deleted = table.deleted | hits
    n_del = jnp.sum(hits & ~table.deleted)
    return new_deleted, n_del

t0=time.time(); nd, n = stepD(table, graph, head, rank, on_tip, chain_len, K); jax.block_until_ready(nd)
print(f"stepD ok {time.time()-t0:.1f}s n={int(n)}", flush=True)
