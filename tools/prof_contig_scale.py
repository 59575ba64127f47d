"""Contig-stage scale run: >=1e6-edge isoform-dense graph on the chip.

VERDICT r4 #4: the edge-level stages (tourbus waves, edge_clean
fixpoints, concatenate) had never run above toy edge counts; mouse
scale is millions of edges (reference src/bubble.c:2048 operates on
the full edge_array).  This builds a real graph through the
production pregraph path — a synthetic transcriptome with a SNP
every ~60bp between isoform pairs, chopped at 5x duplication — then
times the FULL contig stage (bubble pinch + cleaning fixpoint +
concatenation) twice (run 2 reuses every same-shape compiled
program).

Usage: python tools/prof_contig_scale.py [n_tx] [snp_every]
Defaults target ~1.2M edges: 12000 tx x 1500bp, SNP every 60bp.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("TOOLS_CPU"):
    # sitecustomize force-sets jax_platforms='axon,cpu' (overriding the
    # JAX_PLATFORMS env var); override back before backend init
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from soapdenovo_trans_tpu.graph import arcs as arcs_mod
from soapdenovo_trans_tpu.ops import dictionary
from soapdenovo_trans_tpu.stages import contig as contig_stage
from soapdenovo_trans_tpu.stages import pregraph

K = 23
TX_LEN = 1500
DUP = 5  # coverage per transcript copy (keeps weak-edge filter honest)


def synth_pool(n_tx: int, snp_every: int) -> np.ndarray:
    rng = np.random.default_rng(7)
    txs = rng.integers(0, 4, size=(n_tx, TX_LEN), dtype=np.uint8)
    iso = txs[: n_tx // 2].copy()
    pos = np.arange(snp_every, TX_LEN - 50, snp_every)
    iso[:, pos] = (iso[:, pos] + rng.integers(
        1, 4, size=(iso.shape[0], pos.size))) % 4
    return np.concatenate([txs, iso]).astype(np.uint8)


def batches_of(pool: np.ndarray):
    """Each pool row DUP times, in 4096-row batches (one compile)."""
    reps = np.repeat(pool, DUP, axis=0)
    lengths = np.full(reps.shape[0], TX_LEN, np.int32)
    B = 4096
    for off in range(0, reps.shape[0], B):
        c = reps[off:off + B]
        l = lengths[off:off + B]
        if c.shape[0] < B:
            pad = B - c.shape[0]
            c = np.concatenate([c, np.zeros((pad, TX_LEN), np.uint8)])
            l = np.concatenate([l, np.zeros(pad, np.int32)])
        yield c, l, 0


def main():
    n_tx = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    snp_every = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    print(f"backend: {jax.default_backend()}")
    pool = synth_pool(n_tx, snp_every)
    print(f"[synth] {pool.shape[0]} seqs x {TX_LEN}bp, SNP every "
          f"{snp_every}bp in {n_tx // 2} isoform pairs")

    t0 = time.time()
    res = pregraph.run_pregraph(
        lambda: batches_of(pool), K, clip_tips=False)
    n_edges = int(res.edges.n_edges)
    print(f"[pregraph] {res.n_distinct} kmers -> {n_edges} edges, "
          f"{int(res.arcs.n)} preArcs ({time.time() - t0:.1f}s)")

    for attempt in (1, 2):
        t0 = time.time()
        ctg = contig_stage.run_contig(
            res.edges, res.arcs, K, table=res.table)
        dt = time.time() - t0
        print(f"[contig] run {attempt}: {dt:.1f}s "
              f"({n_edges} edges -> {int(ctg.n)} contigs)", flush=True)


if __name__ == "__main__":
    main()
