"""Bubble pinching — delegates to the wave-parallel Tour-Bus.

Reference: bubblePinch (src/bubble.c:2048-2135).  The device-parallel
formulation (majority forest + non-forest-arc candidates + vmapped
LCS identity + claim arbitration) lives in graph/tourbus.py; this
module keeps the stage-facing entry point.
"""

from __future__ import annotations

from . import arcs as arcs_mod
from . import unitigs


def bubble_pinch(eg: unitigs.EdgeGraph, aset: arcs_mod.ArcSet,
                 table, k: int, merge_level: int):
    """Run the Tour-Bus bubble pass (no-op at merge_level <= 0)."""
    if merge_level <= 0:
        return eg, aset
    from . import tourbus
    eg, aset, stats = tourbus.pinch(eg, aset, k, merge_level)
    print(f"[bubbles] tourbus: {stats['backtracked']} pairs found, "
          f"{stats['compared']} compared, {stats['merged']} merged")
    return eg, aset
