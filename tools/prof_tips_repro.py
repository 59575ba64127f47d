"""Repro: kmer tip clipping on a ~11M-kmer table on the chip.

The 500k-pair e2e run crashed the TPU worker inside single_tips at a
10.8M-kmer table (clip_tip_kmers -> _tip_pass_device); this isolates
the four sub-programs with a true sync between each to find the
faulting one.  Table is synthesized on device: random sorted 2-lane
keys with realistic coverage payloads.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from soapdenovo_trans_tpu.graph import dbg as dbg_mod, kmer_clean
from soapdenovo_trans_tpu.ops import dictionary

K = 23


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][:1])


def make_table(n):
    cap = dictionary.round_up(n)
    rng = np.random.default_rng(0)
    # random distinct-ish 46-bit keys, sorted
    hi = rng.integers(0, 1 << 14, size=cap, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, size=cap, dtype=np.uint64).astype(
        np.uint32)
    keys = jnp.stack([jnp.asarray(hi), jnp.asarray(lo)], axis=-1)
    res = jax.lax.sort((keys[:, 0], keys[:, 1]), num_keys=2)
    keys = jnp.stack(res, axis=-1)
    count = jnp.asarray(rng.integers(1, 20, size=cap, dtype=np.int32))
    l_cov = jnp.asarray(rng.integers(
        0, 8, size=(cap, 4), dtype=np.int32))
    r_cov = jnp.asarray(rng.integers(
        0, 8, size=(cap, 4), dtype=np.int32))
    return dictionary.KmerTable(
        keys, count, l_cov, r_cov, jnp.int32(n),
        jnp.zeros(cap, bool))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_800_000
    print(f"backend: {jax.default_backend()}  n={n}")
    t = make_table(n)
    sync(t.keys)
    print("table on device", flush=True)

    t0 = time.time()
    graph = dbg_mod.build_dbg(t, K)
    sync(graph.exists)
    print(f"build_dbg ok ({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    prev, member, head_cand, in_deg = kmer_clean._tip_prev(
        t, graph, True)
    sync(prev)
    print(f"_tip_prev ok ({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    head, rank, _ = kmer_clean._rank_tips(prev, member)
    sync(head)
    print(f"_rank_tips ok ({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    on_tip, chain_len = kmer_clean._tip_chains(
        head, rank, member, head_cand)
    sync(on_tip)
    print(f"_tip_chains ok ({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    deleted, n_del = kmer_clean._tip_clip(
        t, graph, head, rank, on_tip, chain_len, in_deg, K, True)
    print(f"_tip_clip ok ({time.time() - t0:.1f}s) "
          f"n_del={int(n_del)}", flush=True)

    print("REPRO PASSED (no fault)")


if __name__ == "__main__":
    main()
