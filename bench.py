"""Benchmark: k-mer counting throughput on the real TPU chip.

The hot kernel of the assembler (every read passes through it twice)
— chop reads into canonical k-mers + sort-based table build, jitted
as one XLA program.  Reference equivalent: prlRead2HashTable's
chopKmer4read + put_kmerset (src/prlHashReads.c:164-310, 338-707).

Baseline anchor (vs_baseline denominator): the reference
SOAPdenovo-Trans-31mer binary compiled -O3 on THIS host processed
15.6M k-mers in ~1.0s wall during its "hash reads" phase
(200k x 100bp reads, -K 23 -p 2, 2 vCPUs => 15.6 Mkmers/s).
Measured 2026-08-17; see BASELINE.md for the reference's own numbers
(it publishes no throughput figures).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REF_MKMERS_PER_S = 15.6  # reference binary, this host, 2 threads

K = 23
READ_LEN = 100
BATCH = 131072  # 131072 reads -> 10.2M kmers per step


def main():
    import jax
    import jax.numpy as jnp

    from soapdenovo_trans_tpu.ops import dictionary, kmer

    rng = np.random.default_rng(0)
    seqs = rng.integers(0, 4, size=(BATCH, READ_LEN)).astype(np.uint8)
    lengths = np.full(BATCH, READ_LEN, dtype=np.int32)
    kmers_per_step = BATCH * (READ_LEN - K + 1)

    @jax.jit
    def count_step(seqs, lengths):
        stream = kmer.chop_reads(seqs, lengths, K)
        return dictionary._build_device(
            stream.kmers, stream.prev, stream.next, stream.valid)

    iters = 5
    # distinct pre-staged batches + a scalar readback per iteration:
    # defeats any runtime memoization of identical dispatches and
    # guarantees the device actually finished (remote-PJRT-safe).
    batches = []
    for i in range(iters):
        s = rng.integers(0, 4, size=(BATCH, READ_LEN)).astype(np.uint8)
        batches.append((jnp.asarray(s), jnp.asarray(lengths)))

    out = count_step(*batches[0])  # warmup/compile
    _ = int(out[4])

    t0 = time.perf_counter()
    outs = [count_step(s, l) for s, l in batches]  # pipelined dispatch
    total_unique = sum(int(o[4]) for o in outs)    # sync every result
    dt = time.perf_counter() - t0
    assert total_unique > 0

    mkmers = kmers_per_step * iters / dt / 1e6
    print(json.dumps({
        "metric": "kmer_count_throughput",
        "value": round(mkmers, 2),
        "unit": "Mkmers/s",
        "vs_baseline": round(mkmers / REF_MKMERS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
