"""Phase-attributed profile of the NEW run-based capacity path, with
true readback syncs (block_until_ready lies through the tunnel).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from soapdenovo_trans_tpu.ops import dictionary, readpack
from soapdenovo_trans_tpu.stages import pregraph

K = 23
READ_LEN = 100
BATCH = 100000
N_BATCHES = 7


def true_sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[:1] if getattr(leaf, "ndim", 0) else leaf)


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


def run_pass(batches, lengths, verbose):
    log = {}

    def mark(name, t0):
        log[name] = log.get(name, 0.0) + (time.time() - t0)
        return time.time()

    acc = dictionary.RunAccumulator(
        collapse_rows=pregraph.COLLAPSE_ROWS)
    units = list(pregraph._iter_build_units(
        ((b, lengths, 0) for b in batches), K,
        pregraph.TARGET_BUILD_ROWS))
    t0 = time.time()
    for codes, lens in units:
        prepped = dictionary.prep_host_reads(codes, lens)
        t0 = mark("host_pack", t0)
        true_sync(prepped[1])
        t0 = mark("h2d", t0)
        r = dictionary.sorted_run_from_prepped(prepped, K)
        rows = r.rows
        true_sync(rows)
        t0 = mark("build_sort", t0)
        acc.insert(r)
        if len(acc.runs) and verbose:
            pass
        true_sync(acc.runs[-1].rows)
        t0 = mark("kernel_merges", t0)
    run = acc.finish()
    true_sync(run.rows)
    t0 = mark("final_fold", t0)
    rows_c, count_c, nu = dictionary._dedup_sorted_device(
        run.rows, run.count)
    n = int(nu)
    t0 = mark("dedup", t0)
    pt = dictionary._fit_packed(rows_c, count_c, n,
                                dictionary.round_up(max(n, 1)))
    true_sync(pt.rows)
    t0 = mark("fit", t0)
    table = dictionary.finalize(
        dictionary.PackedTable(pt.rows, pt.count, pt.n), K)
    true_sync(table.keys)
    t0 = mark("finalize", t0)
    if verbose:
        for name, dt in log.items():
            print(f"  {name}: {dt:.2f}s")
    return table


def device_resident(batches, lengths, total_rows):
    """Device-work-only capacity: all build units pre-uploaded, then
    the full build+merge+dedup+finalize chain timed alone — the
    counting rate a local chip (H2D at PCIe speed, not a ~15-80 MB/s
    stdio tunnel) would sustain at this depth."""
    units = list(pregraph._iter_build_units(
        ((b, lengths, 0) for b in batches), K,
        pregraph.TARGET_BUILD_ROWS))
    prepped = [dictionary.prep_host_reads(c, l) for c, l in units]
    for p in prepped:
        true_sync(p[1])

    def one_pass():
        acc = dictionary.RunAccumulator(
            collapse_rows=pregraph.COLLAPSE_ROWS)
        for p in prepped:
            acc.insert(dictionary.sorted_run_from_prepped(p, K))
        return dictionary.finalize_run(acc.finish(), K)

    t = one_pass()  # warm remaining compiles
    true_sync(t.keys)
    times = []
    for _ in range(3):
        t0 = time.time()
        t = one_pass()
        true_sync(t.keys)
        times.append(time.time() - t0)
    dt = sorted(times)[1]
    print(f"device-resident: {dt:.2f}s -> "
          f"{total_rows / dt / 1e6:.2f} Mkmers/s (median of 3, "
          f"n={int(t.n)})")


def main():
    print(f"backend: {jax.default_backend()}")
    batches = make_batches()
    lengths = np.full(2 * BATCH, READ_LEN, np.int32)
    total_rows = N_BATCHES * 2 * BATCH * (READ_LEN - K + 1)
    t0 = time.time()
    run_pass(batches, lengths, verbose=False)
    print(f"pass 1 (compiles): {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    table = run_pass(batches, lengths, verbose=True)
    dt = time.time() - t0
    print(f"pass 2 (warm): {dt:.2f}s -> {total_rows / dt / 1e6:.2f} "
          f"Mkmers/s  (n={int(table.n)})")
    device_resident(batches, lengths, total_rows)


if __name__ == "__main__":
    main()
