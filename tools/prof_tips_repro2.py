"""Repro 2: the EXACT e2e pregraph sequence at 13M distinct k-mers on
the chip — real counted table (capacity fixture), then
clip_tip_kmers (minor_out -> single_tips -> minor_tips), per-phase
syncs.  Repro 1 (synthetic sparse table) passed; the e2e crash needs
real adjacency and/or the minor_out-first allocation pattern.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from soapdenovo_trans_tpu.graph import kmer_clean
from soapdenovo_trans_tpu.stages import pregraph

K = 23
READ_LEN = 100
BATCH = 100000
N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 7


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
    print(f"backend: {jax.default_backend()}")
    batches = make_batches()
    lengths = np.full(2 * BATCH, READ_LEN, np.int32)
    t0 = time.time()
    table = pregraph.count_reads(
        ((b, lengths, 0) for b in batches), K)
    print(f"count: {int(table.n)} distinct "
          f"({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    table = kmer_clean.minor_out(table, K)
    print(f"minor_out ok ({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    table = kmer_clean.single_tips(table, K)
    print(f"single_tips ok ({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    table = kmer_clean.minor_tips(table, K)
    print(f"minor_tips ok ({time.time() - t0:.1f}s)", flush=True)

    print("REPRO2 PASSED (no fault)")


if __name__ == "__main__":
    main()
