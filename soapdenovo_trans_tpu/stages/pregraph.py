"""Stage 1 — pregraph: reads -> k-mer table -> unitig edge graph + preArcs.

Drives the TPU-native equivalents of call_pregraph (reference
src/pregraph.c:33-111): prlRead2HashTable (counting), the low-frequency
k-mer filter (-d), kmer-level tip clipping, kmer2edges (condensation)
and prlRead2edge (read->path preArcs).  Stage boundaries remain
host-level (the reference writes files between stages; we keep the
arrays and optionally write compatible files).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import arcs as arcs_mod
from ..graph import dbg as dbg_mod
from ..graph import unitigs
from ..ops import dictionary, kmer


@dataclasses.dataclass
class PregraphResult:
    table: dictionary.KmerTable  # full table (dense path) or the mini
    #                              endpoint table (sharded path)
    graph: Optional[dbg_mod.DBG]
    edges: unitigs.EdgeGraph
    patch: arcs_mod.PatchTable
    arcs: arcs_mod.ArcSet
    k: int
    freq_hist: Optional[object] = None  # np histogram (sharded path)
    n_distinct: int = 0


class _MergeForest:
    """Logarithmic streaming accumulation of per-batch PackedTables.

    A linear ``merge(acc, batch)`` re-sorts the whole accumulator every
    batch — quadratic in batch count.  Binary-counter merging (LSM
    style) keeps one table per size class and merges equal-rank tables,
    so each row is re-sorted O(log n_batches) times total.  The merge
    unit is the packed (k-mer, context) row (dictionary.PackedTable);
    coverage splitting happens once, in finalize."""

    def __init__(self, merge_fn=None):
        self.levels: list = []
        self._merge = merge_fn or dictionary.merge_packed

    def insert(self, t) -> None:
        i = 0
        while True:
            if i == len(self.levels):
                self.levels.append(t)
                return
            if self.levels[i] is None:
                self.levels[i] = t
                return
            t = self._merge(self.levels[i], t)
            self.levels[i] = None
            i += 1

    def finish(self):
        out = None
        for t in self.levels:
            if t is None:
                continue
            out = t if out is None else self._merge(out, t)
        return out


# Build-unit sizing for the run-based counting path: IO batches are
# aggregated host-side to ~this many k-mer rows per device build (the
# reference's per-fill planning unit is 1e8 k-mers, prlHashReads.c:42;
# ours is smaller because each unit is ONE sort, not a hash fill), and
# full units share one compiled shape.  The collapse bound caps HBM.
import os as _os

TARGET_BUILD_ROWS = int(_os.environ.get(
    "SOAPDENOVO_TPU_BUILD_ROWS", 32_000_000))
COLLAPSE_ROWS = int(_os.environ.get(
    "SOAPDENOVO_TPU_COLLAPSE_ROWS", 192_000_000))


def _iter_build_units(batches, k: int, target_rows: int):
    """Aggregate (codes, lengths, lib) IO batches into large build
    units per read-width class.  Full units are exactly the same
    (reads, width) shape (one compile); only the tail unit differs."""
    pend = {}  # width -> [codes list, lengths list, n_reads]
    for codes, lengths, _lib in batches:
        codes = np.asarray(codes)
        lengths = np.asarray(lengths)
        l = codes.shape[1]
        win = max(l - k + 1, 1)
        unit_reads = -(-target_rows // win)     # ceil
        unit_reads = -(-unit_reads // 4096) * 4096
        ent = pend.setdefault(l, [[], [], 0])
        ent[0].append(codes)
        ent[1].append(lengths)
        ent[2] += codes.shape[0]
        while ent[2] >= unit_reads:
            all_c = np.concatenate(ent[0]) if len(ent[0]) > 1 else ent[0][0]
            all_l = np.concatenate(ent[1]) if len(ent[1]) > 1 else ent[1][0]
            yield all_c[:unit_reads], all_l[:unit_reads]
            ent[0] = [all_c[unit_reads:]]
            ent[1] = [all_l[unit_reads:]]
            ent[2] -= unit_reads
    for l, ent in pend.items():
        if ent[2] <= 0:
            continue
        all_c = np.concatenate(ent[0]) if len(ent[0]) > 1 else ent[0][0]
        all_l = np.concatenate(ent[1]) if len(ent[1]) > 1 else ent[1][0]
        pad = -all_c.shape[0] % 4096
        if pad:
            # pad rows carry length 0, so their codes are never read:
            # pad with 0 (not the N code 4) to keep the tail unit on
            # the 2-bit packed H2D path (readpack's N sideband)
            all_c = np.concatenate(
                [all_c, np.zeros((pad, l), np.uint8)])
            all_l = np.concatenate(
                [all_l, np.zeros(pad, all_l.dtype)])
        yield all_c, all_l


def count_reads(batches, k: int, mesh=None) -> dictionary.KmerTable:
    """Pass 1: k-mer counting via sorted-run accumulation (reference
    prlRead2HashTable's batch loop, prlHashReads.c:338).

    Each build unit is one fused chop+pack+sort; runs merge through
    the O(n) merge-path kernel with NO host syncs and NO intermediate
    dedup compaction (counts ride along; finalize absorbs duplicate
    rows).  One dedup + finalize at the end.  See
    dictionary.RunAccumulator for the HBM-bounding collapse.

    With a mesh, batches are data-parallel over devices and the k-mer
    space is prefix-sharded with all_to_all routing; the result is
    GATHERED to one table (legacy helper — run_pregraph's mesh path
    keeps shards resident instead)."""
    if mesh is not None:
        from ..parallel import sharded_count

        return sharded_count.gather_to_table(
            _count_reads_sharded(batches, k, mesh))
    import concurrent.futures as _cf

    acc = dictionary.RunAccumulator(collapse_rows=COLLAPSE_ROWS)
    # Two-stage prefetch pipeline.  Serialized phase attribution at
    # 109M rows (tools/prof_capacity2.py): host pack 1.5s, tunnel H2D
    # 2.3s, ALL device work 2.4s — the host side exceeds the device
    # side, so pack and H2D must overlap each other as well as the
    # device work.  Thread A packs unit i+2 (pure numpy) while thread
    # B device_puts unit i+1 and the main thread dispatches unit i.
    with _cf.ThreadPoolExecutor(max_workers=1) as pack_ex, \
            _cf.ThreadPoolExecutor(max_workers=1) as put_ex:
        put_q = []  # futures of prep_host_reads results (on device)
        pack_fut = None
        for unit in _iter_build_units(batches, k, TARGET_BUILD_ROWS):
            if pack_fut is not None:
                packed = pack_fut
                put_q.append(put_ex.submit(
                    lambda p: dictionary.put_prepped(p.result()), packed))
            pack_fut = pack_ex.submit(dictionary.pack_host_reads, *unit)
            while len(put_q) > 2:
                acc.insert(dictionary.sorted_run_from_prepped(
                    put_q.pop(0).result(), k))
        if pack_fut is not None:
            put_q.append(put_ex.submit(
                lambda p: dictionary.put_prepped(p.result()), pack_fut))
        for f in put_q:
            acc.insert(dictionary.sorted_run_from_prepped(f.result(), k))
    run = acc.finish()
    if run is None:
        raise ValueError("no reads")
    return dictionary.finalize_run(run, k)


def _count_reads_sharded(batches, k: int, mesh):
    """Resident sharded counting: returns a ShardedTable ON THE MESH
    (the table is never gathered; graph passes run sharded too)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import sharded_count

    d = mesh.shape[sharded_count.AXIS]
    sh2 = NamedSharding(mesh, P(sharded_count.AXIS, None))
    sh1 = NamedSharding(mesh, P(sharded_count.AXIS))
    merger = sharded_count.make_sharded_merger(mesh)
    forest = _MergeForest(merge_fn=merger)
    runners = {}
    for codes, lengths, _lib in batches:
        r, l = codes.shape
        if r % d:  # pad rows so the batch splits evenly over devices
            pad = d - r % d
            codes = np.concatenate(
                [codes, np.full((pad, l), 4, np.uint8)])
            lengths = np.concatenate(
                [lengths, np.zeros(pad, lengths.dtype)])
            r += pad
        key = (r, l)
        if key not in runners:
            cap0 = None  # make_sharded_counter's balanced default
            runners[key] = (sharded_count.make_sharded_counter(
                mesh, k, r // d, l, bucket_cap=cap0), cap0)
        # The step is pure, so on bucket overflow (data skew beyond the
        # balanced split points) just recompile with 2x capacity and
        # re-run the same batch — correctness never depends on the cap.
        while True:
            run, cap = runners[key]
            st = run(jax.device_put(jnp.asarray(codes), sh2),
                     jax.device_put(jnp.asarray(lengths), sh1))
            dropped = int(jnp.sum(st.dropped))
            if not dropped:
                break
            windows = l - k + 1
            cap = 2 * (cap or max(128, (2 * (r // d) * windows) // d))
            print(f"[pregraph] shard bucket overflow ({dropped} dropped) "
                  f"— retrying with bucket_cap={cap}")
            runners[key] = (sharded_count.make_sharded_counter(
                mesh, k, r // d, l, bucket_cap=cap), cap)
        # accumulate INTO the mesh-resident shards — no per-batch gather
        forest.insert(st)
    sp = forest.finish()
    if sp is None:
        raise ValueError("no reads")
    return sharded_count.make_sharded_finalizer(mesh, k)(sp)


def delete_low_freq(table: dictionary.KmerTable,
                    cutoff: int) -> dictionary.KmerTable:
    """-d: mark k-mers with count <= cutoff deleted (reference
    thread_delow, prlHashReads.c:844)."""
    if cutoff <= 0:
        return table
    deleted = table.deleted | (table.count <= cutoff)
    live = jnp.arange(table.capacity) < table.n
    return table._replace(deleted=deleted & live | table.deleted)


def run_pregraph(batch_iter_factory, k: int,
                 low_freq_cutoff: int = 0,
                 clip_tips: bool = True, mesh=None,
                 path_recorder_factory=None) -> PregraphResult:
    """batch_iter_factory: zero-arg callable returning a fresh iterator
    of (codes, lengths, lib) batches — called twice (two read passes,
    like the reference).

    path_recorder_factory: optional callable(edges) -> recorder with
    add_batch(slots (r,2p), arc_ok (r,2p)) — the repsTie .path hook
    (reference recordPathBin, prlRead2path.c:507).

    With a mesh, the ENTIRE stage runs on resident shards — counting,
    DBG build, tip clipping, condensation, read threading — and only
    the condensed edge graph (edges << kmers) lands on the host
    (_run_pregraph_sharded; VERDICT r2 item 2)."""
    if mesh is not None:
        return _run_pregraph_sharded(
            batch_iter_factory, k, low_freq_cutoff, clip_tips, mesh,
            path_recorder_factory=path_recorder_factory)
    t0 = time.time()
    table = count_reads(batch_iter_factory(), k)
    print(f"[pregraph] {int(table.n)} distinct kmers "
          f"({time.time() - t0:.1f}s)")
    table = delete_low_freq(table, low_freq_cutoff)

    if clip_tips:
        from ..graph import kmer_clean
        t0 = time.time()
        table = kmer_clean.clip_tip_kmers(table, k)
        print(f"[pregraph] kmer tip clipping done ({time.time() - t0:.1f}s)")

    t0 = time.time()
    graph = dbg_mod.build_dbg(table, k)
    edges = unitigs.condense(graph, table, k)
    print(f"[pregraph] {int(edges.n_edges)} edges "
          f"({time.time() - t0:.1f}s)")

    patch = arcs_mod.build_patch(edges, table, k)
    recorder = path_recorder_factory(edges) if path_recorder_factory \
        else None
    t0 = time.time()
    forest = arcs_mod.ArcForest(edges.twin)
    # thread_reads compile time grows ~linearly with the row count on
    # the TPU backend (measured 2026-08-21 after the flat _path_slots
    # rewrite: 77s at 4096 rows, 334s at 16384 — down from >35 MIN at
    # 32768 before it; tools/prof_compile.py).  Default to the 4096
    # shape; mouse-scale runs can pay the one-time (disk-cached)
    # compile of a larger shape for proportionally fewer dispatches.
    # Chunk dispatches are fully async — candidates buffer on device
    # and fold through ONE count_arcs (host sync) per GROUP chunks, so
    # the tunnel round trip is paid 1/GROUP as often.
    chunk = int(_os.environ.get("SOAPDENOVO_TPU_THREAD_ROWS", 4096))
    group = 16
    buf = []
    for codes, lengths, _lib in batch_iter_factory():
        for off in range(0, codes.shape[0], chunk):
            cc = codes[off:off + chunk]
            cl = lengths[off:off + chunk]
            if cc.shape[0] < chunk:
                pad = chunk - cc.shape[0]
                cc = np.concatenate(
                    [cc, np.full((pad, cc.shape[1]), 4, cc.dtype)])
                cl = np.concatenate([cl, np.zeros(pad, cl.dtype)])
            f, t, v = arcs_mod.thread_reads(
                jnp.asarray(cc), jnp.asarray(cl), table, edges,
                patch, k)
            if recorder is not None:
                r, l = cc.shape
                p2 = 2 * (l - k + 1)
                recorder.add_batch(np.asarray(t).reshape(r, p2),
                                   np.asarray(v).reshape(r, p2))
            buf.append((f, t, v))
            if len(buf) >= group:
                forest.insert(arcs_mod.count_arcs_many(buf, edges.twin))
                buf = []
    if buf:
        forest.insert(arcs_mod.count_arcs_many(buf, edges.twin))
    aset = forest.finish()
    print(f"[pregraph] {int(aset.n)} preArcs ({time.time() - t0:.1f}s)")
    return PregraphResult(table, graph, edges, patch, aset, k,
                          n_distinct=int(table.n))


def _run_pregraph_sharded(batch_iter_factory, k: int,
                          low_freq_cutoff: int, clip_tips: bool,
                          mesh, path_recorder_factory=None
                          ) -> PregraphResult:
    """Mesh-resident pregraph: the k-mer table and every table-sized
    pass stay sharded; the host receives only the condensed edge graph
    with a mini endpoint table (parallel/sharded_pregraph.py)."""
    import jax

    from ..parallel import sharded_pregraph as spg

    t0 = time.time()
    st = _count_reads_sharded(batch_iter_factory(), k, mesh)
    cap = st.keys.shape[1]
    n_distinct = int(np.asarray(st.n).sum())
    print(f"[pregraph] {n_distinct} distinct kmers across "
          f"{st.keys.shape[0]} resident shards ({time.time() - t0:.1f}s)")

    live = jnp.arange(cap)[None, :] < st.n[:, None]
    deleted = jnp.where(
        live & (st.count <= low_freq_cutoff), 1, 0
    ).astype(jnp.int32) if low_freq_cutoff > 0 else \
        jnp.zeros(st.keys.shape[:2], jnp.int32)

    hist = spg.kmer_freq_sharded(mesh, st, deleted)
    routers = spg.Routers.build(mesh, cap)
    if clip_tips:
        t0 = time.time()
        deleted = spg.clip_tip_kmers_sharded(mesh, routers, st, deleted,
                                             k)
        print(f"[pregraph] kmer tip clipping done "
              f"({time.time() - t0:.1f}s)")

    t0 = time.time()
    edges, mini_table, node_edge, node_pos = spg.condense_sharded(
        mesh, routers, st, deleted, k)
    print(f"[pregraph] {int(edges.n_edges)} edges "
          f"({time.time() - t0:.1f}s)")

    patch = arcs_mod.build_patch(edges, mini_table, k)
    recorder = path_recorder_factory(edges) if path_recorder_factory \
        else None
    t0 = time.time()
    d = st.keys.shape[0]
    forest = arcs_mod.ArcForest(edges.twin)
    for codes, lengths, _lib in batch_iter_factory():
        r, l = codes.shape
        if r % d:
            pad = d - r % d
            codes = np.concatenate(
                [codes, np.full((pad, l), 4, np.uint8)])
            lengths = np.concatenate(
                [lengths, np.zeros(pad, lengths.dtype)])
        f, t, v = spg.thread_reads_sharded(
            mesh, routers, st, deleted, node_edge, node_pos, edges,
            patch, codes, lengths, k)
        if recorder is not None:
            rp2 = 2 * (l - k + 1)
            recorder.add_batch(np.asarray(t).reshape(-1, rp2),
                               np.asarray(v).reshape(-1, rp2))
        forest.insert(arcs_mod.count_arcs(
            jnp.asarray(f), jnp.asarray(t), jnp.asarray(v), edges.twin))
    aset = forest.finish()
    print(f"[pregraph] {int(aset.n)} preArcs ({time.time() - t0:.1f}s)")
    return PregraphResult(mini_table, None, edges, patch, aset, k,
                          freq_hist=hist, n_distinct=n_distinct)


def kmer_freq_histogram(table: dictionary.KmerTable,
                        max_freq: int = 256) -> np.ndarray:
    """.kmerFreq content (reference freqStat, prlHashReads.c:994):
    histogram of k-mer occurrence counts, clamped at max_freq."""
    counts = np.asarray(table.count[: int(table.n)])
    clamped = np.clip(counts, 0, max_freq - 1)
    return np.bincount(clamped, minlength=max_freq)
