"""Single-process A/B of counting-path variants, medians of repeated
passes (tunnel variance swamps single-run deltas).

A: legacy PackedTable forest (build_packed_from_reads + merge_packed)
B: run path with packed H2D + prefetch (production count_reads)
C: run path, raw u8 H2D (no packing)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from soapdenovo_trans_tpu.ops import dictionary
from soapdenovo_trans_tpu.stages import pregraph
from soapdenovo_trans_tpu.stages.pregraph import _MergeForest

K = 23
READ_LEN = 100
BATCH = 100000
N_BATCHES = 7
REPS = 3


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


def variant_a(batches, lengths_np):
    lengths = jnp.asarray(lengths_np)
    forest = _MergeForest()
    for b in batches:
        forest.insert(dictionary.build_packed_from_reads(
            jnp.asarray(b), lengths, K))
    levels = [t for t in forest.levels if t is not None]
    acc = levels[0]
    for t in levels[1:-1]:
        acc = dictionary.merge_packed(acc, t)
    if len(levels) > 1:
        return dictionary.merge_finalize(acc, levels[-1], K)
    return dictionary.finalize(acc, K)


def variant_b(batches, lengths_np):
    return pregraph.count_reads(
        ((b, lengths_np, 0) for b in batches), K)


def variant_c(batches, lengths_np):
    acc = dictionary.RunAccumulator(
        collapse_rows=pregraph.COLLAPSE_ROWS)
    for codes, lens in pregraph._iter_build_units(
            ((b, lengths_np, 0) for b in batches), K,
            pregraph.TARGET_BUILD_ROWS):
        acc.insert(dictionary.sorted_run_from_reads(
            jnp.asarray(codes), jnp.asarray(lens.astype(np.int32)), K))
    return dictionary.finalize_run(acc.finish(), K)


def main():
    print(f"backend: {jax.default_backend()}")
    batches = make_batches()
    lengths_np = np.full(2 * BATCH, READ_LEN, np.int32)
    total_rows = N_BATCHES * 2 * BATCH * (READ_LEN - K + 1)
    variants = [("A legacy-forest", variant_a),
                ("B run+pack", variant_b),
                ("C run-raw", variant_c)]
    # warmup all (compile-cache warm from prior runs; cheap reload)
    for name, fn in variants:
        t0 = time.time()
        tb = fn(batches, lengths_np)
        assert int(tb.n) > 0
        print(f"warm {name}: {time.time() - t0:.1f}s", flush=True)
    for name, fn in variants:
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            tb = fn(batches, lengths_np)
            assert int(tb.n) > 0
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: median {med:.2f}s "
              f"({total_rows / med / 1e6:.1f} Mkmers/s) "
              f"all={[round(x, 2) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
