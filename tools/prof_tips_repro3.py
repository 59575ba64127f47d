"""Repro 3: bisect the single_tips sub-program that kills the TPU
worker at pow2 caps (2^24-row table, real adjacency).

Run with SOAPDENOVO_TPU_CAP_MODE=pow2.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from soapdenovo_trans_tpu.graph import dbg as dbg_mod, kmer_clean
from soapdenovo_trans_tpu.ops import dictionary
from soapdenovo_trans_tpu.stages import pregraph

K = 23
READ_LEN = 100
BATCH = 100000
N_BATCHES = 7


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][:1])


def make_batches():
    TX_LEN = 1500
    n_tx = 9000
    rng = np.random.default_rng(0)
    txs = [rng.integers(0, 4, size=TX_LEN).astype(np.uint8)
           for _ in range(n_tx)]
    out = []
    for _ in range(N_BATCHES):
        b = np.empty((2 * BATCH, READ_LEN), np.uint8)
        for i in range(2 * BATCH):
            t = txs[rng.integers(0, n_tx)]
            s = rng.integers(0, TX_LEN - READ_LEN + 1)
            r = t[s:s + READ_LEN]
            if rng.integers(0, 2):
                r = r[::-1] ^ 2
            b[i] = r
        out.append(b)
    return out


def main():
    print(f"backend: {jax.default_backend()}  "
          f"CAP_MODE={dictionary.CAP_MODE}")
    batches = make_batches()
    lengths = np.full(2 * BATCH, READ_LEN, np.int32)
    t0 = time.time()
    table = pregraph.count_reads(
        ((b, lengths, 0) for b in batches), K)
    print(f"count: {int(table.n)} distinct, cap={table.capacity} "
          f"({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    graph = dbg_mod.build_dbg(table, K)
    sync(graph.exists)
    print(f"build_dbg ok ({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    prev, member, head_cand, in_deg = kmer_clean._tip_prev(
        table, graph, True)
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
        table, graph, head, rank, on_tip, chain_len, in_deg, K, True)
    print(f"_tip_clip ok ({time.time() - t0:.1f}s) "
          f"n_del={int(n_del)}", flush=True)
    print("REPRO3 PASSED (no fault)")


if __name__ == "__main__":
    main()
