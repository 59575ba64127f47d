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
jax.block_until_ready(graph.out_deg)
print("dbg ok", flush=True)
two_cap = 2 * CAP

@jax.jit
def stepA(table, graph):
    cap = table.capacity
    two_cap = 2 * cap
    nodes = jnp.arange(two_cap, dtype=jnp.int32)
    in_deg = graph.out_deg[nodes ^ 1]
    single = table.count[nodes >> 1] == 1
    elig = graph.linear & graph.live & single
    head_cand = graph.live & (in_deg == 0) & (graph.out_deg == 1) & single
    ex = graph.exists
    e0, e1, e2, e3 = ex[0::4], ex[1::4], ex[2::4], ex[3::4]
    xr = nodes ^ 1
    tb = jnp.where(e0[xr], 0, jnp.where(e1[xr], 1, jnp.where(e2[xr], 2, 3))).astype(jnp.int32)
    in_arc = dbg_mod.twin_arc(graph, dbg_mod.arc_id(xr, tb))
    pred = jnp.where(in_deg == 1, in_arc >> 2, -1)
    member = elig | head_cand
    sm = jnp.where((pred >= 0) & (pred < two_cap), member[jnp.clip(pred, 0)], False)
    so = jnp.where((pred >= 0) & (pred < two_cap), graph.out_deg[jnp.clip(pred, 0)], 0)
    prev = jnp.where(elig & (pred >= 0) & sm & (so == 1), pred, -1)
    prev = jnp.where(member, prev, -1)
    return prev, member, head_cand

t0=time.time(); prev, member, head_cand = stepA(table, graph); jax.block_until_ready(prev)
print(f"stepA ok {time.time()-t0:.1f}s", flush=True)

lr = jax.jit(ranking.list_rank)
t0=time.time(); head, rank, is_head = lr(prev, member); jax.block_until_ready(head)
print(f"list_rank ok {time.time()-t0:.1f}s", flush=True)

@jax.jit
def stepC(head, rank, member, head_cand):
    two_cap = head.shape[0]
    chain_of_head_ok = jnp.where(head >= 0, head_cand[jnp.clip(head, 0)], False)
    on_tip = member & chain_of_head_ok
    chain_len = jax.ops.segment_max(
        jnp.where(on_tip, rank + 1, 0),
        jnp.where(on_tip, head, two_cap),
        num_segments=two_cap + 1)[:two_cap]
    return on_tip, chain_len

t0=time.time(); on_tip, chain_len = stepC(head, rank, member, head_cand); jax.block_until_ready(chain_len)
print(f"segment_max ok {time.time()-t0:.1f}s", flush=True)
