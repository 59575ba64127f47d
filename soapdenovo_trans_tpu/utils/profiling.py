"""Stage timing + device profiling hooks.

The reference prints wall-clock deltas per phase (pregraph.c:61-110,
prlRead2path.c per-signal t0..t6, main.c:408 total); this module
keeps the same habit as a structured table, plus an opt-in JAX
profiler trace for per-kernel inspection (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import OrderedDict
from typing import Iterator

_TIMINGS: "OrderedDict[str, float]" = OrderedDict()


@contextlib.contextmanager
def stage_timer(name: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _TIMINGS[name] = _TIMINGS.get(name, 0.0) + time.perf_counter() - t0


def timing_table() -> str:
    if not _TIMINGS:
        return ""
    total = sum(_TIMINGS.values())
    lines = ["stage timing:"]
    for name, dt in _TIMINGS.items():
        lines.append(f"  {name:<12s} {dt:8.1f}s  {100 * dt / total:5.1f}%")
    lines.append(f"  {'total':<12s} {total:8.1f}s")
    return "\n".join(lines)


def reset() -> None:
    _TIMINGS.clear()


@contextlib.contextmanager
def device_trace(out_dir: str | None = None) -> Iterator[None]:
    """Wrap a region in a JAX profiler trace when SDT_TRACE_DIR (or
    out_dir) is set; otherwise a no-op."""
    out_dir = out_dir or os.environ.get("SDT_TRACE_DIR")
    if not out_dir:
        yield
        return
    import jax

    with jax.profiler.trace(out_dir):
        yield
