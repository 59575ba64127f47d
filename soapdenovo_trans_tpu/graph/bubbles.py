"""Bubble pinching (Tour-Bus equivalent) — reference src/bubble.c.

The reference runs a coverage-weighted Dijkstra (DFibHeap) from every
starting edge, detects re-converging paths, aligns them with a banded
Needleman-Wunsch, and merges the minority path onto the majority
(bubblePinch, bubble.c:2048-2135).

Implemented here as a bounded-radius parallel reformulation — see
bubble_pinch below.  Until the full pass lands, bubble_pinch is a
no-op passthrough (equivalent to running the reference with -M 0).
"""

from __future__ import annotations


def bubble_pinch(edges, aset, table, k: int, merge_level: int):
    """TODO(round 1 follow-up): parallel Tour-Bus.  Currently -M 0
    behavior (no bubble merging)."""
    print("[bubbles] bubble pinching not yet implemented (-M 0 behavior)")
    return edges, aset
