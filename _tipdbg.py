import sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_sdt_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from soapdenovo_trans_tpu.ops import dictionary
from soapdenovo_trans_tpu.graph import dbg as dbg_mod, kmer_clean

CAP = 16 * (1 << 20)
K = 23
rng = np.random.default_rng(0)
# sorted unique random canonical-ish keys (53-bit space packed hi<<~)
raw = np.sort(rng.choice(2**52, size=CAP, replace=False).astype(np.uint64))
keys = np.stack([(raw >> 32).astype(np.uint32),
                 (raw & 0xFFFFFFFF).astype(np.uint32)], axis=1)
table = dictionary.KmerTable(
    jnp.asarray(keys), jnp.ones(CAP, jnp.int32),
    jnp.asarray(rng.integers(0, 3, size=(CAP, 4), dtype=np.int64).astype(np.int32)),
    jnp.asarray(rng.integers(0, 3, size=(CAP, 4), dtype=np.int64).astype(np.int32)),
    jnp.int32(CAP - 5), jnp.zeros(CAP, bool))

t0 = time.time()
graph = dbg_mod.build_dbg(table, K)
jax.block_until_ready(graph.out_deg)
print(f"build_dbg OK {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
deleted, n = kmer_clean._tip_pass_device(table, graph, K, True)
print(f"tip_pass OK {time.time()-t0:.1f}s n={int(n)}", flush=True)
