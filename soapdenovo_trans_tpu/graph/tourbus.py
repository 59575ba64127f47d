"""ctypes binding for the native Tour-Bus bubble pass (csrc/tourbus.cpp).

The full multi-node-path bubble machinery of the reference
(bubblePinch, src/bubble.c:2048-2135): coverage-weighted Dijkstra,
MAXNODELENGTH-bounded path backtracking (3/9/30 by -M), global NW
identity check (DIFF window, >=90%), minority-onto-majority merge.
Runs host-side on the condensed graph (edges << kmers); compiled on
demand with g++ like the fastx decoder.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "csrc", "tourbus.cpp")
_SO = os.path.join(_REPO, "csrc", "libtourbus.so")

_lib = None
_checked = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    if not os.path.exists(_SO) or (
            os.path.exists(_SRC) and
            os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.tourbus_run.restype = ctypes.c_int64
    lib.tourbus_run.argtypes = [
        ctypes.c_int32, i32, i32, i32, u8, i64, u8,
        ctypes.c_int32, i32, i32, i32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _round_up(x: int, m: int = 128) -> int:
    return ((x + m - 1) // m) * m


def pinch(eg, aset, k: int, merge_level: int
          ) -> Tuple[object, object, dict]:
    """Run the native Tour-Bus on an EdgeGraph + ArcSet; returns
    (EdgeGraph, ArcSet, counters).  Host round-trip by design — the
    bubble pass is a once-per-stage serial-ancestry algorithm
    (SURVEY.md §7.3); everything around it stays on device."""
    from . import unitigs
    from . import arcs as arcs_mod

    lib = _load()
    if lib is None:
        raise RuntimeError("native tourbus unavailable")

    n = int(eg.n_edges)
    length = np.ascontiguousarray(np.asarray(eg.length[:n], np.int32))
    cvg = np.ascontiguousarray(np.asarray(eg.cvg[:n], np.int32))
    twin = np.ascontiguousarray(np.asarray(eg.twin[:n], np.int32))
    deleted = np.ascontiguousarray(
        np.asarray(eg.deleted[:n], bool).astype(np.uint8))
    seq_off = np.ascontiguousarray(np.asarray(eg.seq_off[:n], np.int64))
    pool = np.ascontiguousarray(np.asarray(eg.seq_pool, np.uint8))

    na = int(aset.n)
    af = np.asarray(aset.from_ed[:na], np.int32)
    at = np.asarray(aset.to_ed[:na], np.int32)
    am = np.asarray(aset.mult[:na], np.int32)
    # merges only ever shrink the arc set, but remaps can combine
    # rows; 2x headroom then retry-grow
    cap = max(128, 2 * na)
    while True:
        bf = np.zeros(cap, np.int32)
        bt = np.zeros(cap, np.int32)
        bm = np.zeros(cap, np.int32)
        bf[:na], bt[:na], bm[:na] = af, at, am
        counters = np.zeros(3, np.int64)
        dele = deleted.copy()
        cvg2 = cvg.copy()
        out = lib.tourbus_run(
            n, length, cvg2, twin, dele, seq_off, pool,
            na, bf, bt, bm, cap, k, merge_level,
            unitigs.MAX_EDGE_COV, counters)
        if out >= 0:
            break
        cap *= 2

    m = int(out)
    new_deleted = np.asarray(eg.deleted, bool).copy()
    new_deleted[:n] = dele.astype(bool)
    new_cvg = np.asarray(eg.cvg, np.int32).copy()
    new_cvg[:n] = cvg2
    eg2 = eg._replace(
        cvg=jnp.asarray(new_cvg), deleted=jnp.asarray(new_deleted))
    a_cap = max(_round_up(m), 128)
    f2 = np.full(a_cap, -1, np.int32)
    t2 = np.full(a_cap, -1, np.int32)
    m2 = np.zeros(a_cap, np.int32)
    f2[:m], t2[:m], m2[:m] = bf[:m], bt[:m], bm[:m]
    aset2 = arcs_mod.ArcSet(
        jnp.asarray(f2), jnp.asarray(t2), jnp.asarray(m2), jnp.int32(m))
    stats = {"backtracked": int(counters[0]),
             "compared": int(counters[1]),
             "merged": int(counters[2])}
    return eg2, aset2, stats
