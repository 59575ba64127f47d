"""Stage 2 — contig: edge-graph cleaning + concatenation -> contigs.

Drives the TPU-native equivalents of call_heavygraph (reference
src/contig.c:225-296):

    bubblePinch(0.9, M)        [M>0; see graph/bubbles.py]
    deleteWeakEdge(de)
    cutTipsInGraph(0, 0)
    deleteUnlikeArc; delowHighArc(H)
    fixpoint { deleteSimpleLoop; deleteLightArc;
               if changed: linearConcatenate + compactEdgeArray }
    deleteShortContig(48); final linearConcatenate/compact
    output_contig

The reference's linearConcatenate inside the loop mutates the edge
array in place; here each concatenation produces a fresh Contigs
graph, so the loop re-runs the arc filters on progressively merged
graphs exactly like the reference's laps.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..graph import arcs as arcs_mod
from ..graph import contig_merge, edge_clean
from ..ops import dictionary


@dataclasses.dataclass
class ContigParams:
    """CLI knobs (reference contig.c initenv + global.h defaults)."""

    weak_cvg: int = 20          # -e EdgeCovCutoff * 10 (default e=2)
    merge_level: int = 1        # -M bubble merge level
    light_out_pct: int = 5      # -q da
    light_flow_pct: int = 2     # -Q dA
    high_arc_multi: int = 200   # -H
    short_component: int = 48   # cut_length


def _as_edgegraph(ctg: contig_merge.Contigs):
    """Re-wrap a Contigs result in the EdgeGraph pytree so the same
    cleaning/concatenation passes can run on merged graphs (the
    node->edge interior map no longer applies and is left empty)."""
    from ..graph import unitigs

    none = jnp.full(1, -1, jnp.int32)
    return unitigs.EdgeGraph(
        from_node=ctg.from_node, to_node=ctg.to_node, length=ctg.length,
        cvg=ctg.cvg, twin=ctg.twin, seq_off=ctg.seq_off,
        seq_pool=ctg.seq_pool, n_edges=ctg.n,
        node_edge=none, node_pos=none,
        deleted=jnp.zeros(ctg.length.shape[0], bool))


def run_contig(edges, aset: arcs_mod.ArcSet, k: int,
               params: Optional[ContigParams] = None,
               table=None):
    """Returns (contigs, arcs) after the full cleaning pipeline."""
    params = params or ContigParams()
    t0 = time.time()

    if params.merge_level > 0 and table is not None:
        from ..graph import bubbles
        edges, aset = bubbles.bubble_pinch(
            edges, aset, table, k, params.merge_level)

    edges = edge_clean.delete_weak_edges(edges, params.weak_cvg)
    edges = edge_clean.cut_tips(edges, aset, k)
    aset = edge_clean.compact_arcs(aset, edges)
    aset = edge_clean.delete_unlike_arcs(aset, edges)
    aset = edge_clean.delow_high_arc(aset, edges, params.high_arc_multi)

    ctg = contig_merge.concatenate(edges, aset)
    graph = _as_edgegraph(ctg)
    aset = ctg.arcs
    for lap in range(64):
        aset = edge_clean.delete_simple_loops(aset, graph)
        aset, changed = edge_clean.delete_light_arcs(
            aset, graph, params.light_out_pct, params.light_flow_pct)
        if not changed:
            break
        aset = edge_clean.compact_arcs(aset, graph)
        ctg = contig_merge.concatenate(graph, aset)
        graph = _as_edgegraph(ctg)
        aset = ctg.arcs

    graph2 = edge_clean.delete_short_components(
        graph, aset, params.short_component)
    aset = edge_clean.compact_arcs(aset, graph2)
    ctg = contig_merge.concatenate(graph2, aset)
    print(f"[contig] {int(ctg.n)} contigs ({time.time() - t0:.1f}s)")
    return ctg
