"""Instrumented profile of bench.py --capacity: where does the time go
at 1e8-row depth?  Times each per-batch build, each LSM merge (split
into merge-kernel vs dedup-compaction vs fit), and the final finalize,
with device sync between phases.  Second pass = warm numbers.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from soapdenovo_trans_tpu.ops import dictionary
from soapdenovo_trans_tpu.kernels import merge_path

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

    def make_big_batch():
        out = np.empty((2 * BATCH, READ_LEN), np.uint8)
        for i in range(2 * BATCH):
            t = txs[rng.integers(0, n_tx)]
            s = rng.integers(0, TX_LEN - READ_LEN + 1)
            r = t[s:s + READ_LEN]
            if rng.integers(0, 2):
                r = r[::-1] ^ 2
            out[i] = r
        return out

    return [make_big_batch() for _ in range(N_BATCHES)]


def sync(x):
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, x)


def timed_merge(a, b, label, log):
    t0 = time.time()
    rows, count = merge_path.merge_sorted_rows(
        a.rows, a.count, b.rows, b.count, a.n, b.n)
    sync((rows, count))
    t_kernel = time.time() - t0
    t0 = time.time()
    rows_c, count_c, num_unique = dictionary._dedup_sorted_device(
        rows, count)
    n = int(num_unique)
    t_dedup = time.time() - t0
    t0 = time.time()
    out = dictionary._fit_packed(rows_c, count_c, n,
                                 dictionary.round_up(max(n, 1)))
    sync(out)
    t_fit = time.time() - t0
    log.append((label, int(a.n), int(b.n), n, t_kernel, t_dedup, t_fit))
    return out


def run_pass(batches, lengths, verbose):
    log = []
    levels = []
    t_build = 0.0
    for bi, b in enumerate(batches):
        t0 = time.time()
        t = dictionary.build_packed_from_reads(
            jnp.asarray(b), lengths, K)
        sync(t)
        t_build += time.time() - t0
        i = 0
        while True:
            if i == len(levels):
                levels.append(t)
                break
            if levels[i] is None:
                levels[i] = t
                break
            t = timed_merge(levels[i], t, f"b{bi}/L{i}", log)
            levels[i] = None
            i += 1
    acc = None
    for t in levels:
        if t is None:
            continue
        acc = t if acc is None else timed_merge(acc, t, "finish", log)
    t0 = time.time()
    table = dictionary.finalize(acc, K)
    sync(table)
    t_final = time.time() - t0
    if verbose:
        print(f"  build total: {t_build:.2f}s "
              f"({N_BATCHES} batches of 15.6M rows)")
        tot_k = tot_d = tot_f = 0.0
        for label, na, nb, n, tk, td, tf in log:
            print(f"  merge {label}: {na / 1e6:.1f}M+{nb / 1e6:.1f}M "
                  f"-> {n / 1e6:.1f}M  kernel {tk:.2f}s dedup {td:.2f}s "
                  f"fit {tf:.2f}s")
            tot_k += tk
            tot_d += td
            tot_f += tf
        print(f"  merge totals: kernel {tot_k:.2f}s dedup {tot_d:.2f}s "
              f"fit {tot_f:.2f}s")
        print(f"  finalize: {t_final:.2f}s  (n={int(table.n)})")
    return table, t_build + sum(x[4] + x[5] + x[6] for x in log) + t_final


def main():
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    batches = make_batches()
    lengths = jnp.asarray(np.full(2 * BATCH, READ_LEN, np.int32))
    total_rows = N_BATCHES * 2 * BATCH * (READ_LEN - K + 1)
    print(f"{N_BATCHES} batches, {total_rows / 1e6:.1f}M rows")

    t0 = time.time()
    run_pass(batches, lengths, verbose=False)
    print(f"pass 1 (compiles): {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    table, acc = run_pass(batches, lengths, verbose=True)
    dt = time.time() - t0
    print(f"pass 2 (warm): {dt:.2f}s wall, {acc:.2f}s summed "
          f"-> {total_rows / dt / 1e6:.2f} Mkmers/s")


if __name__ == "__main__":
    main()
