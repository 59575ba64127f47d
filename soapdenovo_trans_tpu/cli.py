"""Command-line interface mirroring the reference binary's subcommands.

Reference: main.c:49-106 dispatches pregraph/contig/map/scaff/all;
flags per stage in pregraph.c:118-185, contig.c:311, map.c:115,
scaffold.c:108, main.c:136.  Same flag letters, same defaults
(global.h:102-116): K=23, -e 2, -M 1, -d 0, -L 100, -t 5.

Usage:
    python -m soapdenovo_trans_tpu all -s reads.config -o out -K 23
    python -m soapdenovo_trans_tpu pregraph -s reads.config -o out
    python -m soapdenovo_trans_tpu contig -g out
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import numpy as np


# Device read-batch size: 32768 reads/dispatch keeps the chip fed
# (245 tiny batches at 4096 cost a ~20 ms tunnel round trip each);
# the test suite pins it small via the env to keep compiles tiny.
def _batch_reads() -> int:
    return int(os.environ.get("SOAPDENOVO_TPU_READ_BATCH", "32768"))


def _add_common(p):
    p.add_argument("-s", dest="config", help="lib config file")
    p.add_argument("-o", "-g", dest="out", required=True,
                   help="output graph prefix")
    p.add_argument("-K", dest="k", type=int, default=23,
                   help="kmer size (odd, 13..127)")
    p.add_argument("-p", dest="ncpu", type=int, default=8,
                   help="(accepted for compatibility; parallelism is "
                        "device-mesh driven)")


def build_parser():
    ap = argparse.ArgumentParser(prog="soapdenovo-trans-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pg = sub.add_parser("pregraph", help="reads -> kmer/edge graph")
    _add_common(pg)
    pg.add_argument("-d", dest="low_kmer", type=int, default=0,
                    help="delete kmers with frequency <= this")
    pg.add_argument("-i", dest="minor_pct", type=int, default=5,
                    help="minor-neighbor removal %% (dd)")
    pg.add_argument("-a", dest="init_mem", type=int, default=0,
                    help="initial memory assumption in GB (reference "
                         "initKmerSetSize, pregraph.c:160; accepted "
                         "for compatibility — table capacity here is "
                         "sized from the data)")
    pg.add_argument("-n", dest="n_kmer", action="store_true",
                    help="count N-containing kmer windows under one "
                         "sentinel entry (reference N_kmer/InvalidKmer, "
                         "prlHashReads.c:207)")
    pg.add_argument("-R", dest="reps_tie", action="store_true",
                    help="record read paths: .path + .markOnEdge "
                         "(recordPathBin, prlRead2path.c:507; the "
                         "reference's own -R case is commented out, "
                         "pregraph.c:149-151 — these files are "
                         "unreachable there)")

    cg = sub.add_parser("contig", help="edge graph -> contigs")
    cg.add_argument("-g", dest="out", required=True)
    cg.add_argument("-e", dest="edge_cov", type=int, default=2,
                    help="delete edges with coverage <= this")
    cg.add_argument("-M", dest="merge_level", type=int, default=1,
                    help="strength of kmer-graph bubble merging 0..3")
    cg.add_argument("-q", dest="light_out", type=int, default=5)
    cg.add_argument("-Q", dest="light_flow", type=int, default=2)
    cg.add_argument("-H", dest="high_arc", type=int, default=200)
    cg.add_argument("-R", dest="reps_tie", action="store_true",
                    help="splitReps: duplicate repeat edges whose "
                    "neighbor pairing is resolved by .path read paths")
    cg.add_argument("-S", dest="short_cutoff", type=int, default=48,
                    help="remove short-contig components below this "
                         "length (reference cut_length, contig.c:333)")

    mp = sub.add_parser("map", help="reads -> contig placements")
    _add_common(mp)
    mp.add_argument("-f", dest="gap_reads", action="store_true",
                    help="output gap related reads "
                         "(.readInGap/.PEreadOnContig.gz/"
                         ".shortreadInGap.gz)")
    mp.add_argument("-r", dest="read_trace", action="store_true")
    mp.add_argument("-R", dest="rpkm", action="store_true")

    sc = sub.add_parser("scaff", help="links -> transcripts")
    sc.add_argument("-g", dest="out", required=True)
    sc.add_argument("-s", dest="config", default=None,
                    help="lib config (needed to re-stream reads for -F)")
    sc.add_argument("-L", dest="min_contig", type=int, default=100)
    sc.add_argument("-t", dest="max_transcripts", type=int, default=5)
    sc.add_argument("-G", dest="gap_len_diff", type=int, default=50,
                    help="allowed gap-size error for gap filling")
    sc.add_argument("-F", dest="fill_gaps", action="store_true")
    sc.add_argument("-S", dest="skip_scaffold", action="store_true",
                    help="elongate initial scaffolds only (resume "
                         "without rebuilding the transcript structure)")
    sc.add_argument("-r", dest="read_trace", action="store_true",
                    help="write .readOnScaf")
    sc.add_argument("-R", dest="rpkm", action="store_true",
                    help="write .readOnScaf and .RPKM.Stat")
    sc.add_argument("-N", dest="genome_size", type=int, default=0,
                    help="known genome/transcriptome size for NG50 in "
                         ".scafStatistics (reference scaffold.c:124)")
    sc.add_argument("-u", dest="no_mask_rep", action="store_true",
                    help="accepted for compatibility: the reference "
                         "sets maskRep=0 (scaffold.c:134) but maskRepeat "
                         "lives in the bypassed genome scaffolder, so "
                         "-u has no effect on the Trans flow")
    sc.add_argument("-c", dest="max_cnt", type=int, default=0,
                    help="keep at most this many outgoing links per "
                         "non-unique contig (deleteUnlikelyCnt, "
                         "transcriptome.c:2202; 0 or >10 = off)")

    al = sub.add_parser("all", help="full pipeline")
    _add_common(al)
    al.add_argument("-d", dest="low_kmer", type=int, default=0)
    al.add_argument("-i", dest="minor_pct", type=int, default=5)
    al.add_argument("-e", dest="edge_cov", type=int, default=2)
    al.add_argument("-M", dest="merge_level", type=int, default=1)
    al.add_argument("-q", dest="light_out", type=int, default=5)
    al.add_argument("-Q", dest="light_flow", type=int, default=2)
    al.add_argument("-H", dest="high_arc", type=int, default=200)
    al.add_argument("-L", dest="min_contig", type=int, default=100,
                    help="minimum contig length for scaffolding")
    al.add_argument("-G", dest="gap_len_diff", type=int, default=50)
    al.add_argument("-F", dest="fill_gaps", action="store_true")
    al.add_argument("-f", dest="gap_reads", action="store_true")
    al.add_argument("-S", dest="skip_scaffold", action="store_true")
    al.add_argument("-t", dest="max_transcripts", type=int, default=5)
    al.add_argument("-r", dest="read_trace", action="store_true")
    al.add_argument("-R", dest="rpkm", action="store_true")
    al.add_argument("-a", dest="init_mem", type=int, default=0,
                    help="memory assumption hint (compat; see pregraph -a)")
    al.add_argument("-n", dest="n_kmer", action="store_true")
    al.add_argument("-c", dest="max_cnt", type=int, default=0)
    al.add_argument("-u", dest="no_mask_rep", action="store_true")
    al.add_argument("-D", dest="low_edge_cov", type=int, default=0,
                    help="accepted for compatibility: the reference "
                         "parses -D (main.c:181) but never forwards it "
                         "to any stage (main.c:313-323 commented out)")
    al.add_argument("-k", dest="kmer_small", type=int, default=0,
                    help="accepted for compatibility: the reference "
                         "forwards -k to the map stage (main.c:357) "
                         "whose getopt string has no 'k' (map.c:115), "
                         "so it is ignored there too")
    return ap


class _CountingFactory:
    """Read-batch factory that tallies per-lib read counts on its
    first pass (for the .peGrads boundaries, reference
    prlHashReads.c:626-645)."""

    def __init__(self, cfg, batch_size=None, n_kmer_k=0):
        batch_size = batch_size or _batch_reads()
        self.cfg = cfg
        self.batch_size = batch_size
        self.lib_counts = None
        self.n_kmer_k = n_kmer_k  # if >0, tally N-containing windows
        self.n_windows = 0

    def __call__(self):
        from .io import fastx

        count = self.lib_counts is None
        if count:
            self.lib_counts = {}

        def gen():
            for codes, lens, li in fastx.config_read_batches(
                    self.cfg, self.batch_size):
                if count:
                    self.lib_counts[li] = self.lib_counts.get(li, 0) + \
                        int((lens > 0).sum())
                    if self.n_kmer_k:
                        self.n_windows += _count_n_windows(
                            codes, lens, self.n_kmer_k)
                yield codes, lens, li

        return gen()

    def pe_grads(self):
        """[(insertS, cumulative read bound, rank, pair_num_cut)] over
        PE libs in ascending insert order (reference lib sort,
        lib.c:97)."""
        counts = self.lib_counts or {}
        libs = sorted(
            ((li, lib) for li, lib in enumerate(self.cfg.libs)),
            key=lambda x: x[1].avg_ins)
        grads, bound = [], 0
        for li, lib in libs:
            bound += counts.get(li, 0)
            if lib.avg_ins > 0 and lib.has_pairs:
                grads.append((lib.avg_ins, bound, 0,
                              getattr(lib, "pair_num_cut", 0) or 3))
        return grads, bound


def _count_n_windows(codes, lens, k):
    """In-range k-mer windows containing an N (code >= 4) — the
    windows the reference's -n mode feeds to the hash as InvalidKmer
    (kmerZero sentinel, prlHashReads.c:175-213)."""
    r, l = codes.shape
    p = l - k + 1
    if p <= 0:
        return 0
    cs = np.zeros((r, l + 1), np.int32)
    np.cumsum(codes >= 4, axis=1, out=cs[:, 1:])
    has_n = (cs[:, k:] - cs[:, :p]) > 0
    in_range = (np.arange(p)[None, :] + k) <= lens[:, None]
    return int((has_n & in_range).sum())


def _read_batches(cfg, batch_size=None, n_kmer_k=0):
    return _CountingFactory(cfg, batch_size, n_kmer_k=n_kmer_k)


def run_pregraph_cmd(args):
    from .io import libconfig, stagefiles
    from .stages import pregraph as pg_stage

    cfg = libconfig.parse_config(args.config)
    if args.k % 2 == 0 or not (13 <= args.k <= 127):
        sys.exit("K must be odd and within 13..127")
    import os

    import jax

    mesh = None
    # mesh-resident pregraph whenever >1 device is visible; the env
    # override exists for the test suite, where the routed path's
    # per-shape compile cost dwarfs the tiny fixtures (dedicated
    # sharded tests cover the mesh path explicitly)
    if len(jax.devices()) > 1 and \
            not os.environ.get("SOAPDENOVO_TPU_NO_SHARD"):
        from jax.sharding import Mesh

        from .parallel import sharded_count
        mesh = Mesh(np.array(jax.devices()), (sharded_count.AXIS,))
        print(f"[pregraph] sharding kmer space over "
              f"{len(jax.devices())} devices")
    n_kmer = getattr(args, "n_kmer", False)
    factory = _read_batches(cfg, n_kmer_k=args.k if n_kmer else 0)
    recorders = []

    def _recorder_factory(edges):
        from .io import graph_files as _gf
        file_id, _order, nxt = _gf.edge_file_ids(edges)
        rec = stagefiles.PathRecorder(
            args.out + ".path", file_id, nxt)
        recorders.append((rec, nxt))
        return rec

    reps_tie = getattr(args, "reps_tie", False)
    res = pg_stage.run_pregraph(
        factory, args.k,
        low_freq_cutoff=getattr(args, "low_kmer", 0), mesh=mesh,
        path_recorder_factory=_recorder_factory if reps_tie else None)
    if recorders:
        rec, nxt = recorders[0]
        markers = rec.close()
        stagefiles.write_mark_on_edge(
            args.out + ".markOnEdge", markers, nxt - 1)
        print(f"[pregraph] wrote {args.out}.path/.markOnEdge")
    # sharded runs precompute the histogram on the mesh (res.table is
    # then only the mini endpoint table)
    hist = res.freq_hist if res.freq_hist is not None \
        else pg_stage.kmer_freq_histogram(res.table)
    if n_kmer and factory.n_windows:
        # -n: the reference hashes every N-containing window as one
        # InvalidKmer node (prlHashReads.c:207-213); it surfaces in the
        # frequency histogram as a single key with that many hits.  The
        # sentinel never joins the graph here — N windows already break
        # read paths (ops/kmer.py masks them), which is the sentinel's
        # only structural role in the reference.
        hist[min(factory.n_windows, len(hist) - 1)] += 1
        print(f"[pregraph] -n: {factory.n_windows} N-containing "
              f"windows counted as sentinel kmer")
    stagefiles.write_kmer_freq(args.out + ".kmerFreq", hist)
    grads, n_reads = factory.pe_grads()
    if grads:
        stagefiles.write_pe_grads(
            args.out + ".peGrads", grads, n_reads, cfg.max_rd_len)
    from .io import graph_files
    n_vt = graph_files.write_pregraph_files(
        args.out, res.table, res.edges, res.arcs, args.k)
    stagefiles.write_pregraph_basic(
        args.out + ".preGraphBasic",
        n_vertex=n_vt, k=args.k,
        n_edge=int(res.edges.n_edges), max_read_len=cfg.max_rd_len)
    print(f"[pregraph] wrote {args.out}.kmerFreq/.preGraphBasic/"
          f".vertex/.edge.gz/.preArc")
    return res


def _to_np(nt):
    if hasattr(nt, "_fields"):  # NamedTuple (possibly nested)
        return type(nt)(*[_to_np(x) for x in nt])
    return np.asarray(nt)


def _to_jnp(nt):
    import jax.numpy as jnp

    if hasattr(nt, "_fields"):
        return type(nt)(*[_to_jnp(x) for x in nt])
    return jnp.asarray(nt)


def run_contig_cmd(args, res=None):
    from .graph import arcs as arcs_mod
    from .io import stagefiles
    from .ops import dictionary
    from .graph import unitigs
    from .stages import contig as contig_stage

    if res is None:
        # resume from the reference-format stage files
        # (loadVertex/loadEdge/loadPreArcs, src/loadPreGraph.c:52-670)
        from .io import graph_files
        table, edges, aset, k = graph_files.load_pregraph_files(args.out)
        print(f"[contig] loaded {int(edges.n_edges)} edges, "
              f"{int(aset.n)} preArcs from {args.out}.vertex/.edge.gz/"
              f".preArc")
    else:
        k, table, edges, aset = res.k, res.table, res.edges, res.arcs

    path_file = args.out + ".path"
    if getattr(args, "reps_tie", False) and os.path.exists(path_file):
        # solveReps superset (splitReps.c:456; never reached in the
        # reference Trans flow) — resolve repeats with read paths
        from .graph import split_reps
        from .io import graph_files as _gf
        file_id, _o, nxt = _gf.edge_file_ids(edges)
        inv = np.full(nxt + 1, -1, np.int64)
        inv[file_id] = np.arange(file_id.shape[0])
        tri = split_reps.path_triples(
            stagefiles.read_path_bin(path_file), inv)
        edges, aset, n_split = split_reps.solve_reps(edges, aset, tri)
        print(f"[contig] splitReps: {n_split} repeat edges split")

    params = contig_stage.ContigParams(
        weak_cvg=10 * getattr(args, "edge_cov", 2),
        merge_level=getattr(args, "merge_level", 1),
        light_out_pct=getattr(args, "light_out", 5),
        light_flow_pct=getattr(args, "light_flow", 2),
        high_arc_multi=getattr(args, "high_arc", 200),
        short_component=getattr(args, "short_cutoff", 48))
    from .graph import contig_merge
    ctg = contig_stage.run_contig(edges, aset, k, params, table=table)
    # renumber rows into .contig/.ContigIndex file order once, so the
    # internal row ids downstream (map, scaff) == file ids - 1
    ctg = contig_merge.reorder_contigs(
        ctg, contig_merge.contig_file_perm(ctg, k))
    perm = stagefiles.write_contig_fasta(
        args.out + ".contig", ctg, table, k, arcs=ctg.arcs)
    assert perm == list(range(int(ctg.n))), "file perm not identity"
    stagefiles.write_contig_index(args.out + ".ContigIndex", ctg, k, perm)
    from .io import graph_files
    graph_files.write_contig_graph_files(args.out, ctg, table, k, perm)
    print(f"[contig] wrote {args.out}.contig/.ContigIndex/"
          f".updated.edge/.Arc")
    return ctg, table, k


def run_map_cmd(args, ctg=None, table=None):
    import jax.numpy as jnp

    from .graph import connections
    from .io import libconfig
    from .stages import map as map_stage

    cfg = libconfig.parse_config(args.config)
    if ctg is None:
        # resume from reference-format contig stage files
        from .io import graph_files
        ctg, table, k = graph_files.load_contig_graph_files(args.out)
        print(f"[map] loaded {int(ctg.n)} contigs from "
              f"{args.out}.updated.edge/.Arc/.contig")
    else:
        k = args.k

    index = map_stage.build_contig_index(ctg, table, k)
    full_len = ctg.length + k

    # mesh-resident read pass whenever >1 device is visible (the
    # reference threads this pass too, prlRead2Ctg.c:656); same env
    # override as pregraph for the tiny-fixture test suite
    import jax
    mesh = sidx = None
    if len(jax.devices()) > 1 and \
            not os.environ.get("SOAPDENOVO_TPU_NO_SHARD"):
        from jax.sharding import Mesh

        from .parallel import sharded_map
        mesh = Mesh(np.array(jax.devices()), (sharded_map.AXIS,))
        sidx = sharded_map.shard_index(mesh, index, k)
        print(f"[map] sharding contig index over "
              f"{len(jax.devices())} devices")

    placements = []
    want_f = getattr(args, "gap_reads", False)
    group_rows = []      # per batch: (read, ctg, ctg_off, read_off,
                         #             align, same) qualifying groups
    pe_rows, gap_rows = [], []  # -f payloads
    base = 0             # global REAL-read counter across batches —
    #                      padded tail rows (length 0) are not
    #                      numbered, matching the reference's dense
    #                      readno space (readCounter, prlRead2Ctg.c:539)
    lib_reads = {}       # lib index -> reads seen (for .peGrads)
    max_read_len = 0
    from .io import fastx
    # map.vote's flat rewrite compiles O(1) in the row count (83s at
    # 4096 AND 16384 rows, tools/prof_compile.py 2026-08-21); the
    # batch shape is now free to grow — env-tunable like threading
    map_rows = int(os.environ.get("SOAPDENOVO_TPU_MAP_ROWS", 4096))
    for codes, lengths, li in fastx.config_read_batches(
            cfg, map_rows, purpose=2):
        lib = cfg.libs[li]
        if mesh is not None:
            from .parallel import sharded_map
            pl = sharded_map.map_reads_sharded(
                mesh, sidx, codes, lengths, k,
                map_len=lib.map_len or 32)
        else:
            pl = map_stage.map_reads(
                jnp.asarray(codes), jnp.asarray(lengths), index, k,
                map_len=lib.map_len or 32)
        placements.append((pl, li))
        r, l = codes.shape
        p = l - k + 1
        lens_np = np.asarray(lengths)
        real = lens_np > 0
        n_real = int(real.sum())
        # batch row -> 0-based global read index (padding unnumbered)
        row_no = base + np.cumsum(real) - 1
        lib_reads[li] = lib_reads.get(li, 0) + n_real
        if n_real:
            max_read_len = max(max_read_len, int(lens_np.max()))
        ins_for_batch = lib.avg_ins if lib.has_pairs else 0
        if lib.has_pairs and lib.avg_ins > 0:
            ins, n_obs = connections.estimate_insert_size(
                pl.ctg, pl.pos, ctg.twin, full_len, lib.avg_ins)
            if ins != lib.avg_ins:
                print(f"[map] lib {li}: insert size estimate "
                      f"{lib.avg_ins} -> {ins} ({n_obs} pairs)")

        # qualifying alignment groups in read-encounter order
        # (recordAlldgn, reference prlRead2Ctg.c:530-614)
        gv = np.asarray(pl.g_valid)
        qi = np.nonzero(gv)[0]
        if qi.size:
            gr = row_no[np.asarray(pl.g_read)[qi]]
            gro = np.asarray(pl.g_read_off)[qi]
            order = np.lexsort((gro, gr))
            qi = qi[order]
            group_rows.append((
                gr[order], np.asarray(pl.g_ctg)[qi],
                np.asarray(pl.g_ctg_off)[qi], gro[order],
                np.asarray(pl.g_align)[qi], np.asarray(pl.g_same)[qi]))
        if want_f:
            # footprint reads (>= 2 distinct contigs hit): the
            # reference drops these into .readInGap too — they are the
            # gap-spanning evidence (recordAlldgn, prlRead2Ctg.c:593)
            cb = np.asarray(pl.ctg)
            pb = np.asarray(pl.pos)
            lnp = lens_np
            gvb = np.asarray(pl.g_valid)
            grb = np.asarray(pl.g_read)[gvb]
            gcb = np.asarray(pl.g_ctg)[gvb]
            if grb.size:
                pairs_rc = np.unique(
                    grb.astype(np.int64) * (full_len.shape[0] + 1)
                    + gcb, )
                per_read = np.bincount(
                    (pairs_rc // (full_len.shape[0] + 1)).astype(int),
                    minlength=r)
            else:
                per_read = np.zeros(r, np.int64)
            for t1 in np.nonzero((per_read >= 2) & (cb >= 0)
                                 & real)[0]:
                gap_rows.append(
                    (int(row_no[t1]) + 1, int(cb[t1]), int(pb[t1]),
                     np.asarray(codes[t1, : lnp[t1]])))
        if want_f and lib.has_pairs:
            # vectorized pair classification (was a per-pair Python
            # loop): both-mapped -> .PEreadOnContig row; one-mapped ->
            # unmapped mate dropped into the gap at mate pos + insert
            t2s = np.arange(1, r, 2)
            t1s = t2s - 1
            alive = real[t1s] | real[t2s]
            c1a, c2a = cb[t1s], cb[t2s]
            both = alive & (c1a >= 0) & (c2a >= 0)
            if both.any():
                pe_rows.append(np.stack(
                    [row_no[t1s[both]] + 1, c1a[both], pb[t1s[both]],
                     c2a[both], pb[t2s[both]]], axis=1))
            only1 = alive & (c1a >= 0) & (c2a < 0) & (lnp[t2s] > 0)
            only2 = alive & (c2a >= 0) & (c1a < 0) & (lnp[t1s] > 0)
            for j in np.nonzero(only1)[0]:
                t1, t2 = t1s[j], t2s[j]
                gap_rows.append(
                    (int(row_no[t2]) + 1, int(cb[t1]),
                     int(pb[t1]) + ins_for_batch - int(lnp[t2]),
                     np.asarray(codes[t2, : lnp[t2]])))
            for j in np.nonzero(only2)[0]:
                t1, t2 = t1s[j], t2s[j]
                gap_rows.append(
                    (int(row_no[t1]) + 1, int(cb[t2]),
                     int(pb[t2]) + ins_for_batch - int(lnp[t1]),
                     np.asarray(codes[t1, : lnp[t1]])))
        base += n_real

    # .peGrads from the map pass's own library accounting, like the
    # reference's map-side writer (prlRead2Ctg.c:827-840): per-grad
    # cumulative read-number bounds; equal insert sizes merge
    grads = []
    bound = 0
    for li in sorted(lib_reads):
        lib = cfg.libs[li]
        bound += lib_reads[li]
        if not lib.has_pairs or lib.avg_ins <= 0:
            continue
        # raw config value — the reference writes pair_num_cut as-is,
        # 0 when unset (prlRead2Ctg.c:842); the 3-default is applied by
        # the weakPE computation on the consumer side
        cut = getattr(lib, "pair_num_cut", 0)
        if grads and grads[-1][0] == lib.avg_ins:
            grads[-1] = (lib.avg_ins, bound, 0, cut)
        else:
            grads.append((lib.avg_ins, bound, 0, cut))
    from .io import stagefiles
    stagefiles.write_pe_grads(
        args.out + ".peGrads", grads, base, max_read_len)
    # group stream, reference id space (1-based, resolved orientation)
    if group_rows:
        g_read = np.concatenate([g[0] for g in group_rows])
        g_ctg = np.concatenate([g[1] for g in group_rows])
        g_off = np.concatenate([g[2] for g in group_rows])
        g_roff = np.concatenate([g[3] for g in group_rows])
        g_aln = np.concatenate([g[4] for g in group_rows])
        g_same = np.concatenate([g[5] for g in group_rows])
    else:
        g_read = g_ctg = g_off = g_roff = g_aln = np.zeros(0, np.int64)
        g_same = np.zeros(0, bool)
    # .readOnContig: one line per mapped read; odd readnos report the
    # LAST alignment group, even the FIRST (recordAlldgn,
    # prlRead2Ctg.c:565-568); pos = contigOffset - readOffset + 1
    first_of = np.concatenate(
        [np.ones(1, bool), g_read[1:] != g_read[:-1]]) \
        if g_read.size else np.zeros(0, bool)
    last_of = np.concatenate(
        [g_read[1:] != g_read[:-1], np.ones(1, bool)]) \
        if g_read.size else np.zeros(0, bool)
    from .io import stagefiles
    orien_col = np.where(g_same, "+", "-")
    pick = np.where((g_read + 1) % 2 == 1, last_of, first_of) \
        if g_read.size else first_of
    sel = np.nonzero(pick)[0]
    stagefiles.write_placement_table(
        args.out + ".readOnContig",
        g_read[sel] + 1, g_ctg[sel] + 1,
        g_off[sel] - g_roff[sel] + 1, orien_col[sel])
    stagefiles.write_placement_table(
        args.out + ".ctg2Read",
        g_read + 1, g_ctg + 1, g_roff - g_off, orien_col)
    if getattr(args, "read_trace", False) or getattr(args, "rpkm", False):
        # .readInformation (reference prlRead2Ctg.c:575-588, -r/-R):
        # readno readOffset-1 ctg ctgOffset alignLen+K-1 orien, with
        # '-' rows flipped back to the stored-orientation contig
        full_np = np.asarray(full_len)
        twin_np = np.asarray(ctg.twin)
        alen = g_aln + k - 1
        safe_ctg = np.clip(g_ctg, 0, twin_np.shape[0] - 1)
        ri_ctg = np.where(g_same, g_ctg, twin_np[safe_ctg]) + 1
        ri_off = np.where(g_same, g_off,
                          full_np[safe_ctg] - g_off - alen)
        stagefiles.write_read_information(
            args.out + ".readInformation",
            g_read + 1, g_roff - 1, ri_ctg, ri_off, alen, orien_col)
        print(f"[map] wrote {args.out}.readInformation "
              f"({g_read.size} alignments)")
    if want_f:
        pe_flat = np.concatenate(pe_rows) if pe_rows \
            else np.zeros((0, 5), np.int64)
        stagefiles.write_read_in_gap(args.out + ".readInGap", gap_rows)
        stagefiles.write_pe_read_on_contig(
            args.out + ".PEreadOnContig.gz", pe_flat)
        stagefiles.write_short_read_in_gap(
            args.out + ".shortreadInGap.gz",
            [(rn, codes) for rn, _c, _p, codes in gap_rows])
        print(f"[map] wrote {len(gap_rows)} gap reads "
              f"(.readInGap/.shortreadInGap.gz), "
              f"{pe_flat.shape[0]} PE placements (.PEreadOnContig.gz)")
    print(f"[map] wrote {args.out}.readOnContig/.ctg2Read/.peGrads")


def run_scaff_cmd(args, ctg=None, table=None, conn=None):
    from .io import fastx
    from .stages import pelinks
    from .stages import scaff as scaff_stage

    if ctg is None:
        from .io import graph_files
        ctg, table, k = graph_files.load_contig_graph_files(args.out)
        print(f"[scaff] loaded {int(ctg.n)} contigs from "
              f"{args.out}.updated.edge/.Arc/.contig")
    else:
        k = args.k
    # connections are ALWAYS rebuilt from the map stage's files
    # (.peGrads + .readOnContig + .ctg2Read), like the reference's
    # PE2Links/Links2Scaf/singleRead2connection — the scaff stage is
    # resumable from map outputs alone, including outputs written by
    # the reference binary
    conn, link_extra = pelinks.build_connections(
        args.out, ctg, k,
        min_unique_len=getattr(args, "min_contig", 100))
    print(f"[scaff] {int(conn.n)} contig connections from "
          f"{args.out}.readOnContig/.ctg2Read")

    params = scaff_stage.ScaffParams(
        min_unique_len=getattr(args, "min_contig", 100),
        max_transcripts=getattr(args, "max_transcripts", 5),
        gap_len_diff=getattr(args, "gap_len_diff", 50),
        fill_gaps=getattr(args, "fill_gaps", False),
        max_cnt=getattr(args, "max_cnt", 0),
        ins_size_var=link_extra.get("ins_size_var", 20))
    gap_read_source = None
    if params.fill_gaps and getattr(args, "config", None) and \
            link_extra.get("read_ctg") is not None:
        from .io import libconfig as _libcfg
        _cfg = _libcfg.parse_config(args.config)
        gap_read_source = (
            link_extra["read_ctg"], link_extra["read_pos"],
            lambda: fastx.config_read_batches(
                _cfg, _batch_reads(), purpose=2),
            link_extra.get("read_ins"))
    from .io import stagefiles
    preset = None
    if getattr(args, "skip_scaffold", False):
        # .scaf_gap coordinates are in K-exclusive contig-length space
        # (reference outputOneTranscriptome, transcriptome.c:1210)
        preset = stagefiles.read_scaf_gap(
            args.out + ".scaf_gap", np.asarray(ctg.length), k)
        print(f"[scaff] -S: reusing {len(preset)} transcript "
              f"structures from {args.out}.scaf_gap")
    sres = scaff_stage.run_scaff(
        ctg, conn, k, table, params, ctg_arcs=ctg.arcs,
        gap_read_source=gap_read_source, preset_transcripts=preset)
    recs, transcripts, stats, gap_report = (
        sres.recs, sres.transcripts, sres.stats, sres.gap_report)
    fastx.write_fasta(args.out + ".scafSeq", recs)
    stagefiles.write_gap_seq(args.out + ".gapSeq", gap_report)
    stagefiles.write_scaf_files(
        args.out, transcripts, recs,
        np.asarray(ctg.length), np.asarray(ctg.twin), k,
        placements=sres.placements, routes=sres.routes,
        n_runs=sres.n_runs)
    stagefiles.write_scaf_statistics(
        args.out, known_genome_size=getattr(args, "genome_size", 0))
    n_scaf = sum(1 for h, _ in recs if h.startswith("scaffold"))
    if getattr(args, "read_trace", False) or getattr(args, "rpkm", False):
        read_ctg = link_extra.get("read_ctg")
        if read_ctg is not None:
            owner = scaff_stage.record_membership(
                recs, transcripts, np.asarray(ctg.twin), int(ctg.n))
            rec_of, hits = scaff_stage.reads_on_scaffolds(
                read_ctg, link_extra.get("read_pos"), owner, len(recs))
            # reference-format .readOnScaf: join .readInformation x
            # .contigPosInscaff (getReadOnScaf, ReadTrace.c:41-160)
            if os.path.exists(args.out + ".readInformation"):
                stagefiles.write_read_on_scaf(
                    args.out, k, np.asarray(ctg.length) + k,
                    np.asarray(ctg.twin))
                print(f"[scaff] wrote {args.out}.readOnScaf")
            else:
                print("[scaff] -r: no .readInformation (rerun map "
                      "with -r) — .readOnScaf not written")
            if getattr(args, "rpkm", False):
                table_r = scaff_stage.rpkm_table(recs, hits)
                with open(args.out + ".RPKM.Stat", "w") as fh:
                    fh.write("# Notice:RPKM calculation base on "
                             "K-mer mapping.\n")
                    fh.write(f"# Total_unique_reads_num={int(hits.sum())}\n")
                    fh.write("Transcript_ID\tLength\tUniq_reads_num"
                             "\tRPKM\n")
                    for name, ln, h, rp in table_r:
                        fh.write(f"{name}\t{ln}\t{h}\t{rp:f}\n")
                print(f"[scaff] wrote {args.out}.RPKM.Stat")
    print(f"[scaff] {n_scaf} transcripts + "
          f"{len(recs) - n_scaf} singletons -> {args.out}.scafSeq "
          f"(N50={stats.get('N50', 0)})")
    return recs


def _configure_jit_economy():
    """Pipeline runs compile MANY data-dependent shapes; on tunneled
    TPU backends each XLA compile costs tens of seconds while the
    programs themselves run in milliseconds.  Two levers: a persistent
    compilation cache (compile each program once per machine, ever)
    and power-of-two capacity quantization (collapse the shape space).
    Standalone kernels/benches that want exact capacities are
    unaffected — this only runs from the CLI driver."""
    import jax

    from .ops import dictionary

    if os.environ.get("SOAPDENOVO_TPU_CAP_MODE") is None:
        dictionary.CAP_MODE = "pow2"
    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("SOAPDENOVO_TPU_COMPILE_CACHE",
                                         "/tmp/jax_sdt_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main(argv=None):
    from .utils import profiling

    _configure_jit_economy()
    args = build_parser().parse_args(argv)
    profiling.reset()
    t0 = time.time()
    with profiling.device_trace():
        if args.cmd == "pregraph":
            with profiling.stage_timer("pregraph"):
                run_pregraph_cmd(args)
        elif args.cmd == "contig":
            with profiling.stage_timer("contig"):
                run_contig_cmd(args)
        elif args.cmd == "map":
            with profiling.stage_timer("map"):
                run_map_cmd(args)
        elif args.cmd == "scaff":
            with profiling.stage_timer("scaff"):
                run_scaff_cmd(args)
        elif args.cmd == "all":
            with profiling.stage_timer("pregraph"):
                res = run_pregraph_cmd(args)
            with profiling.stage_timer("contig"):
                ctg, table, _k = run_contig_cmd(args, res)
            with profiling.stage_timer("map"):
                conn = run_map_cmd(args, ctg=ctg, table=table)
            with profiling.stage_timer("scaff"):
                run_scaff_cmd(args, ctg=ctg, table=table, conn=conn)
    print(profiling.timing_table())
    print(f"[done] total {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
