"""Pallas TPU bitonic sort over multiword uint32 rows.

The flagship kernel (VERDICT round-1 item 1): replaces ``jax.lax.sort``
in the k-mer counting hot path.  XLA's TPU sort runs one HBM pass per
bitonic stage (~log^2 N passes — 26ms for 10M uint32 on v5e); here all
stages whose compare distance is smaller than a tile are fused into a
single VMEM-resident Pallas kernel, so the sort does

    1 tilesort pass            (all stages of merge steps k <= log T)
  + (log N - log T) rounds of
        (k - log T) cross-tile elementwise passes   (XLA, distance >= T)
      + 1 tilemerge pass                            (Pallas, distance < T)

~6-20 HBM passes total instead of ~300.  Reference analogue: the
put_kmerset probe loop (src/newhash.c:411-462) — the grouping step of
k-mer counting, re-architected as sort-based grouping for a vector
machine.

Layout notes
============
* A "row" is L uint32 lanes, most-significant lane first; sorting is
  lexicographic over all L lanes (numeric order of the L*32-bit value).
* Comparisons run in a biased-int32 domain (lane XOR 0x80000000):
  Mosaic has no unsigned vector compare/min, and the bias makes signed
  order equal unsigned order.
* Inside a tile of T elements the logical element index is COLUMN-major
  over the (R=T/128, 128) VMEM block: i = c*R + r.  All compare
  distances j < R are then sublane-axis shuffles (cheap concat of row
  slices); only the top log2(128) = 7 distances per merge step touch
  the lane axis.  Because every tile uses the same in-tile permutation,
  cross-tile stages (which pair identical in-tile offsets of two tiles)
  are oblivious to it; one transpose at the very end restores flat
  order.
* N must be a power of two (callers pad with 0xFFFFFFFF sentinel rows,
  which sort to the end).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128
_BIAS = jnp.int32(-0x80000000)  # 0x80000000 as int32


def _bias(x: jnp.ndarray) -> jnp.ndarray:
    return (x.astype(jnp.int32)) ^ _BIAS


def _unbias(x: jnp.ndarray) -> jnp.ndarray:
    return (x ^ _BIAS).astype(jnp.uint32)


def _lex_lt_gt(a: list, b: list):
    """(a < b, a > b) lexicographically over the lane lists (i32)."""
    lt = a[-1] < b[-1]
    gt = b[-1] < a[-1]
    for l in range(len(a) - 2, -1, -1):
        eq = a[l] == b[l]
        lt = (a[l] < b[l]) | (eq & lt)
        gt = (b[l] < a[l]) | (eq & gt)
    return lt, gt


def _cmpex(xs: list, ps: list, want_max, num_keys: int):
    """Compare-exchange: keep partner where (partner-vs-self) matches
    want_max (an i32 0/1 array or scalar).  Equal keys never swap.
    All mask math is i32 — Mosaic cannot legalize broadcast/trunc on
    vector<i1>."""
    lt_ps, gt_ps = _lex_lt_gt(ps[:num_keys], xs[:num_keys])
    take = (want_max * gt_ps.astype(jnp.int32)
            + (1 - want_max) * lt_ps.astype(jnp.int32))
    keep_p = take == 1
    return [jnp.where(keep_p, p, x) for x, p in zip(xs, ps)]


def _row_xor(x: jnp.ndarray, j: int) -> jnp.ndarray:
    """Shuffle the sublane (row) axis by XOR with j (power of two).
    Built from two circular rotates + select (same trick as the lane
    axis): a reshape/flip formulation lowers to pathologically slow
    per-row code in Mosaic."""
    up = jnp.roll(x, -j, 0)
    down = jnp.roll(x, j, 0)
    hi = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) >> (
        j.bit_length() - 1)) & 1
    return jnp.where(hi == 1, down, up)


def _lane_xor(x: jnp.ndarray, m: int) -> jnp.ndarray:
    """Shuffle the lane (column) axis by XOR with m (power of two).

    Mosaic cannot reshape the lane axis, so the XOR shuffle is built
    from two circular rotates: lanes with bit m clear take the +m
    neighbour, lanes with it set take the -m neighbour."""
    up = jnp.roll(x, -m, axis=1)    # out[c] = x[c+m]
    down = jnp.roll(x, m, axis=1)   # out[c] = x[c-m]
    hi = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) >> (
        m.bit_length() - 1)) & 1
    return jnp.where(hi == 1, down, up)


def _stage(xs: list, j: int, dir_desc, rows: int, num_keys: int):
    """One bitonic stage at distance j (elements), direction given by
    dir_desc: i32 0/1 array or scalar, 1 where the enclosing 2^k block
    is descending.  Column-major mapping: i = c*rows + r."""
    if j < rows:
        ps = [_row_xor(x, j) for x in xs]
        hi_bit = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
            >> (j.bit_length() - 1)) & 1
    else:
        m = j // rows
        ps = [_lane_xor(x, m) for x in xs]
        hi_bit = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
            >> (m.bit_length() - 1)) & 1
    # want_max = asc XOR is_lo = (1-dir) XOR (1-hi) = dir XOR hi
    want_max = dir_desc ^ hi_bit
    return _cmpex(xs, ps, want_max, num_keys)


def _dir_mask(k: int, rows: int, tile_id, log_t: int):
    """dir_desc (i32 0/1) for merge step k: bit k of the GLOBAL element
    index i_global = tile_id * T + c*rows + r."""
    bit = 1 << k
    t = rows * _LANES
    if bit < rows:
        return (
            jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) >> k
        ) & 1
    if bit < t:
        m_exp = k - (rows.bit_length() - 1)
        return (
            jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
            >> m_exp) & 1
    return (tile_id >> (k - log_t)) & 1


def _schedule_kernel(num_lanes: int, num_keys: int, rows: int,
                     log_t: int, schedule: tuple):
    """Run a chunk of the in-tile bitonic schedule: consecutive
    (k, j) stages with j < T.  Chunking keeps each Mosaic kernel small
    enough to compile (a fully unrolled log^2 T schedule OOMs the
    compiler)."""

    def kernel(*refs):
        ins, outs = refs[:num_lanes], refs[num_lanes:]
        xs = [r[:] for r in ins]
        tile = pl.program_id(0)
        cur_k, dir_desc = None, None
        for k, j in schedule:
            if k != cur_k:
                cur_k = k
                dir_desc = _dir_mask(k, rows, tile, log_t)
            xs = _stage(xs, j, dir_desc, rows, num_keys)
        for r, x in zip(outs, xs):
            r[:] = x

    return kernel


def _tilemerge_kernel(num_lanes: int, num_keys: int, rows: int, log_t: int):
    """Stages j = T/2 .. 1 of one merge step k > log_t.  The direction
    is constant per tile: bit (k - log_t) of the tile id, delivered as
    the scalar-prefetch argument `shift`."""

    def kernel(shift_ref, *refs):
        ins, outs = refs[:num_lanes], refs[num_lanes:]
        xs = [r[:] for r in ins]
        dir_desc = (pl.program_id(0) >> shift_ref[0]) & 1
        for j_exp in range(log_t - 1, -1, -1):
            xs = _stage(xs, 1 << j_exp, dir_desc, rows, num_keys)
        for r, x in zip(outs, xs):
            r[:] = x

    return kernel


try:  # Pallas only where TPU lowering exists; tests use interpret mode
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _pallas_tile_call(kernel, lanes, rows, n_tiles, interpret,
                      scalar=None):
    """Run `kernel` over n_tiles tiles of the (n_rows_total, 128) lane
    arrays; each lane is both input and output (aliased in place)."""
    num_lanes = len(lanes)
    block = (rows, _LANES)
    spec = pl.BlockSpec(block, lambda t, *a: (t, 0),
                        memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in lanes]
    kwargs = {}
    if scalar is not None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[spec] * num_lanes,
            out_specs=[spec] * num_lanes,
        )
        args = (scalar,) + tuple(lanes)
        aliases = {i + 1: i for i in range(num_lanes)}
    else:
        grid_spec = pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[spec] * num_lanes,
            out_specs=[spec] * num_lanes,
        )
        args = tuple(lanes)
        aliases = {i: i for i in range(num_lanes)}
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
        **kwargs,
    )(*args)


def _cross_stage(lanes: list, n: int, j: int, k: int, num_keys: int):
    """One cross-tile bitonic stage (distance j >= T) as pure
    elementwise XLA ops on flat (N,) i32 lanes."""
    final = (1 << (k + 1)) > n  # last merge step: single ascending block
    a_blocks = 1 if final else n >> (k + 1)
    dirs = 1 if final else 2
    b_blocks = min(1 << k, n) // (2 * j)
    shape = (a_blocks, dirs, b_blocks, 2, j)
    vs = [l.reshape(shape) for l in lanes]
    lo = [v[:, :, :, 0] for v in vs]
    hi = [v[:, :, :, 1] for v in vs]
    lt_hl, gt_hl = _lex_lt_gt(hi[:num_keys], lo[:num_keys])
    # axis 1 == 0 -> ascending block (bit k of i clear): swap if hi<lo
    dir_desc = jax.lax.broadcasted_iota(
        jnp.int32, (a_blocks, dirs, b_blocks, j), 1) != 0
    swap = jnp.where(dir_desc, gt_hl, lt_hl)
    out = []
    for l, h in zip(lo, hi):
        nl = jnp.where(swap, h, l)
        nh = jnp.where(swap, l, h)
        out.append(jnp.stack([nl, nh], axis=3).reshape(n))
    return out


def _log2(x: int) -> int:
    l = x.bit_length() - 1
    assert (1 << l) == x, f"{x} not a power of two"
    return l


def sort_lanes(x: jnp.ndarray, num_keys: int | None = None,
               tile_elems: int = 1 << 19,
               interpret: bool = False) -> jnp.ndarray:
    """Sort rows of x ((N, L) uint32, N a power of two) ascending by
    the first `num_keys` lanes (default: all), lexicographic.  Rows
    with equal keys stay together but in arbitrary order (bitonic is
    not stable); remaining lanes ride along as payload.

    On non-TPU platforms pass interpret=True (tests) or use
    `sort_rows` below which falls back to lax.sort.
    """
    n, num_lanes = x.shape
    if num_keys is None:
        num_keys = num_lanes
    t = min(tile_elems, n)
    if n < _LANES * 8:  # too small for the tile machinery
        res = jax.lax.sort(
            tuple(x[:, i] for i in range(num_keys)) +
            tuple(x[:, i] for i in range(num_keys, num_lanes)),
            num_keys=num_keys)
        return jnp.stack(res, axis=-1)
    log_n, log_t = _log2(n), _log2(t)
    rows = t // _LANES
    n_tiles = n // t

    lanes2d = [_bias(x[:, i]).reshape(n // _LANES, _LANES)
               for i in range(num_lanes)]

    schedule = [(k, 1 << j_exp)
                for k in range(1, log_t + 1)
                for j_exp in range(k - 1, -1, -1)]
    max_st = 40
    for lo in range(0, len(schedule), max_st):
        chunk = tuple(schedule[lo: lo + max_st])
        kern = _schedule_kernel(num_lanes, num_keys, rows, log_t, chunk)
        lanes2d = _pallas_tile_call(kern, lanes2d, rows, n_tiles,
                                    interpret)

    if log_n > log_t:
        merge_kern = _tilemerge_kernel(num_lanes, num_keys, rows, log_t)
        flat = [l.reshape(n) for l in lanes2d]
        for k in range(log_t + 1, log_n + 1):
            for j_exp in range(k - 1, log_t - 1, -1):
                flat = _cross_stage(flat, n, 1 << j_exp, k, num_keys)
            lanes2d = [l.reshape(n // _LANES, _LANES) for l in flat]
            shift = jnp.array([k - log_t], dtype=jnp.int32)
            lanes2d = _pallas_tile_call(
                merge_kern, lanes2d, rows, n_tiles, interpret,
                scalar=shift)
            flat = [l.reshape(n) for l in lanes2d]

    # Undo the per-tile column-major permutation: logical i = c*rows+r
    # lives at flat r*128+c; transpose each tile back to flat order.
    out = []
    for l in lanes2d:
        v = l.reshape(n_tiles, rows, _LANES)
        v = jnp.swapaxes(v, 1, 2).reshape(n)
        out.append(_unbias(v))
    return jnp.stack(out, axis=-1)


def sort_rows(x: jnp.ndarray, num_keys: int | None = None) -> jnp.ndarray:
    """Platform-dispatching sort of (N, L) uint32 rows (ascending,
    lexicographic on the first num_keys lanes).  TPU -> Pallas bitonic
    (N padded to a power of two by the caller); elsewhere -> lax.sort."""
    n, num_lanes = x.shape
    if num_keys is None:
        num_keys = num_lanes
    if _HAVE_PALLAS and jax.default_backend() == "tpu" and (
            n & (n - 1)) == 0 and n >= _LANES * 8:
        return sort_lanes(x, num_keys=num_keys)
    res = jax.lax.sort(
        tuple(x[:, i] for i in range(num_lanes)), num_keys=num_keys)
    return jnp.stack(res, axis=-1)
