"""Benchmark: the COMPLETE k-mer counting phase on the real TPU chip.

What is timed (everything the reference's "hash reads" phase does,
minus file parsing, which both sides stage beforehand):

    2 read batches -> chop into canonical k-mers -> per-batch packed
    build (sort + dedup) -> LSM merge of the batches -> finalize
    (split contexts into count + l/r per-base coverage) -> KmerTable

Reference equivalent: prlRead2HashTable = chopKmer4read +
put_kmerset inserts + coverage counters (src/prlHashReads.c:164-310,
338-707, src/newhash.c:411-462).

Fixture: 200k x 100bp reads (15.6M k-mers) sampled with uniform
orientation from a synthetic 2000-transcript x 1500bp transcriptome
(~2.9M distinct k-mers, ~5.4x k-mer coverage) — a realistic RNA-seq
shape, NOT uniform-random reads (those make every k-mer distinct and
understate dedup work on both sides).

Baseline anchor (vs_baseline denominator): the reference
SOAPdenovo-Trans-31mer binary, compiled -O3, run on the SAME reads
(FASTA) on THIS host: `pregraph -K 23 -p 8` "time spent on hash
reads" = 4-5s warm for 15.6M k-mers.  This host has only 2 vCPUs, so
-p 8 saturates 2 cores: 15.6e6 / (4s * 2 cores) = 1.95 Mkmers/s/core.
BASELINE.md frames the target against an 8-core reference, so the
denominator extrapolates PERFECT linear scaling to 8 physical cores:
8 * 1.95 = 15.6 Mkmers/s.  (Measured 2026-08-20; the reference's own
docs publish no throughput figures, see BASELINE.md.)

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

REF_MKMERS_PER_S = 15.6  # 8-core ideal-scaling extrapolation, see above

K = 23
READ_LEN = 100
BATCH = 100000   # x2 batches = the 200k-read reference fixture
N_TX, TX_LEN = 2000, 1500


def make_fixture():
    rng = np.random.default_rng(0)
    txs = [rng.integers(0, 4, size=TX_LEN).astype(np.uint8)
           for _ in range(N_TX)]

    def make_batch():
        out = np.empty((BATCH, READ_LEN), np.uint8)
        for i in range(BATCH):
            t = txs[rng.integers(0, N_TX)]
            s = rng.integers(0, TX_LEN - READ_LEN + 1)
            r = t[s:s + READ_LEN]
            if rng.integers(0, 2):
                r = r[::-1] ^ 2  # reverse complement (code b^2)
            out[i] = r
        return out

    return make_batch(), make_batch()


def capacity():
    """Capacity mode (--capacity): stream >=1e8 k-mer rows (~1.3e7
    distinct) through the LSM forest on the chip — the reference's
    per-fill planning unit is 1e8 k-mers (prlHashReads.c:42).  Prints
    one JSON line with sustained Mkmers/s at depth and the final
    table's device footprint; peak HBM is whatever the deepest merge
    holds (reported as table_mb at the end plus the largest merge
    input sizes printed per level).
    """
    import jax
    import jax.numpy as jnp

    from soapdenovo_trans_tpu.stages import pregraph

    n_batches = 7          # 7 x 200k reads x 78 windows = 109.2M rows
    n_tx = 9000            # ~13.3M distinct k-mers at 1477 windows/tx
    rng = np.random.default_rng(0)
    txs = [rng.integers(0, 4, size=TX_LEN).astype(np.uint8)
           for _ in range(n_tx)]
    lengths = np.full(2 * BATCH, READ_LEN, np.int32)

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

    batches = [make_big_batch() for _ in range(n_batches)]
    total_rows = n_batches * 2 * BATCH * (READ_LEN - K + 1)

    # warmup/compile: one pass over a single batch + merges come up
    # as levels fill (compiles are excluded by timing a second pass)
    def run_pass():
        # the PRODUCTION counting path (stages.pregraph.count_reads):
        # sorted-run accumulation, kernel merges, no host syncs
        table = pregraph.count_reads(
            ((b, lengths, 0) for b in batches), K)
        assert int(table.n) > 0
        return table

    print("[capacity] warmup (compiles)...")
    t0 = time.time()
    table = run_pass()
    warm = time.time() - t0
    print(f"[capacity] warmup pass {warm:.1f}s")
    t0 = time.time()
    table = run_pass()
    dt = time.time() - t0
    n_distinct = int(table.n)
    cap = int(table.keys.shape[0])
    w = int(table.keys.shape[1])
    table_mb = cap * (4 * w + 4 + 32) / 1e6
    print(json.dumps({
        "metric": "kmer_counting_capacity",
        "rows": total_rows,
        "distinct": n_distinct,
        "value": round(total_rows / dt / 1e6, 2),
        "unit": "Mkmers/s",
        "table_mb": round(table_mb, 1),
        "seconds": round(dt, 2),
    }))

    # Device-resident variant: same 109M rows with the build units
    # pre-uploaded — separates the algorithm from this rig's stdio
    # tunnel, whose H2D (~15-80 MB/s) serializes with device execution
    # (a local chip feeds H2D at PCIe speed).  Phase table + analysis
    # in kernels/ROOFLINE.md.
    from soapdenovo_trans_tpu.ops import dictionary
    from soapdenovo_trans_tpu.stages import pregraph as pg

    units = list(pg._iter_build_units(
        ((b, lengths, 0) for b in batches), K, pg.TARGET_BUILD_ROWS))
    prepped = [dictionary.prep_host_reads(c, l) for c, l in units]
    for p in prepped:
        np.asarray(p[1][:1])  # force the transfers to finish

    def resident_pass():
        acc = dictionary.RunAccumulator(collapse_rows=pg.COLLAPSE_ROWS)
        for p in prepped:
            acc.insert(dictionary.sorted_run_from_prepped(p, K))
        return dictionary.finalize_run(acc.finish(), K)

    times = []
    for _ in range(3):
        t0 = time.time()
        t = resident_pass()
        np.asarray(t.keys[:1])
        times.append(time.time() - t0)
    dt = sorted(times)[1]
    print(json.dumps({
        "metric": "kmer_counting_capacity_device_resident",
        "rows": total_rows,
        "value": round(total_rows / dt / 1e6, 2),
        "unit": "Mkmers/s",
        "seconds": round(dt, 2),
    }))


def main():
    import jax
    import jax.numpy as jnp

    from soapdenovo_trans_tpu.ops import dictionary, kmer

    if "--capacity" in sys.argv:
        return capacity()

    b1, b2 = make_fixture()
    lengths = jnp.asarray(np.full(BATCH, READ_LEN, np.int32))
    d1, d2 = jnp.asarray(b1), jnp.asarray(b2)
    total_kmers = 2 * BATCH * (READ_LEN - K + 1)

    def counting_phase(x1, x2):
        # the production path: fused chop+pack+dedup per batch with
        # overlapped dispatch, then the merge-path kernel LSM merge
        # fused straight into finalize (no dedup pass between)
        t1, t2 = dictionary.build_packed_from_reads_many(
            [(x1, lengths), (x2, lengths)], K)
        return dictionary.merge_finalize(t1, t2, K)

    table = counting_phase(d1, d2)  # warmup/compile
    assert int(table.n) > 0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        table = counting_phase(d1, d2)
        _ = int(table.n)  # sync
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]  # median of 3

    mkmers = total_kmers / dt / 1e6
    print(json.dumps({
        "metric": "kmer_counting_phase_throughput",
        "value": round(mkmers, 2),
        "unit": "Mkmers/s",
        "vs_baseline": round(mkmers / REF_MKMERS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
