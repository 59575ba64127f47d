"""Merge-path merge kernel: combine two SORTED packed-row arrays in
O(1) data passes instead of re-sorting their concatenation.

This is the kernel ROOFLINE.md names as the next multiple for the
counting phase: the LSM accumulation (`dictionary.merge_packed`)
merges two already-sorted arrays, yet `jax.lax.sort` costs ~70 ms per
realistic merge — an O(n log n) hammer on an O(n) job.

Design (for WP == 2 packed rows, i.e. K <= 28, plus an int32 count):

* lanes are BIAS-MAPPED int32 (uint32 ^ 0x80000000 viewed signed):
  unsigned order becomes native signed order, which Mosaic lowers
  directly; the all-ones sentinel maps to int32 max and still sorts
  last.
* XLA prepass: merge-path partition — for every output tile boundary
  (diagonal d = i*T) a vectorized binary search finds how many rows
  come from A vs B.  B is also flipped once host-side (`b_rev`), so
  ascending-A ++ descending-B tiles are bitonic without any in-kernel
  reversal.
* Pallas kernel, grid = output tiles: merge-path offsets are
  arbitrary, but Mosaic requires tile-aligned dynamic accesses — so
  each tile window arrives as FOUR adjacent (8, 128) blocks per input
  column (block index = offset//1024, delivered via scalar-prefetch
  index maps), and the kernel re-aligns with a traced global shift
  (sublane roll + lane roll with row-carry).  The aligned halves form
  a bitonic (32, 128) buffer; log2(2T) XOR-stride compare-exchange
  stages (two circular rolls each; strict comparisons both ways so
  equal keys never duplicate their count payload) sort it; the
  smallest T rows are the tile's block-aligned output.

Equal keys may exchange counts between themselves (the merge is not
stable); downstream dedup segment-sums counts over equal-key runs, so
this is observationally irrelevant.

The kernel is TPU-only (Mosaic); callers fall back to the sort path
on other backends or for WP != 2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 8192          # output rows per grid step
LANES = 128
BLK_ROWS = 32        # fetch-granule rows (any multiple of the (8,128)
#                      int32 tiling works; bigger granules = fewer,
#                      larger DMAs per grid step)
BLK = BLK_ROWS * LANES          # 4096 elements per aligned block
WIN_BLKS = 3                    # blocks per window (12288 >= 4095+8192)
WIN_ROWS = WIN_BLKS * BLK_ROWS  # 96

SENT_B = np.int32(0x7FFFFFFF)


def _to_biased(x_u32):
    return (x_u32 ^ np.uint32(0x80000000)).astype(jnp.int32)


def _from_biased(x_i32):
    return x_i32.astype(jnp.uint32) ^ np.uint32(0x80000000)


def _lex_lt(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al < bl))


def _lex_le(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al <= bl))


def _splits(a_hi, a_lo, b_hi, b_lo, n, m, t: int, n_tiles: int):
    """Merge-path partition: for each tile boundary diagonal d = i*t,
    the number of rows taken from A (largest a with A[a-1] <= B[d-a]).
    All diagonals binary-search in lockstep (XLA); n, m may be traced
    (search depth comes from the static capacity)."""
    d = jnp.arange(n_tiles + 1, dtype=jnp.int32) * t
    d = jnp.minimum(d, n + m)
    lo = jnp.maximum(0, d - m)
    hi = jnp.minimum(d, n)

    def le_at(a, dd):
        ai = jnp.clip(a - 1, 0, a_hi.shape[0] - 1)
        bi = jnp.clip(dd - a, 0, b_hi.shape[0] - 1)
        return _lex_le(a_hi[ai], a_lo[ai], b_hi[bi], b_lo[bi])

    def step(_, carry):
        lo, hi = carry
        mid = (lo + hi + 1) >> 1
        ok = le_at(mid, d)
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    steps = int(a_hi.shape[0]).bit_length() + 3
    lo, hi = jax.lax.fori_loop(0, steps, step, (lo, hi))
    return lo  # a at each boundary


def _align_window(win, ofs, t_rows: int):
    """win (WIN_ROWS, 128); return (t_rows, 128) = flat win[ofs :
    ofs + t_rows*128] for a traced ofs in [0, BLK)."""
    r = ofs // LANES
    l = ofs % LANES
    y = pltpu.roll(win, WIN_ROWS - r, 0)     # y[i] = win[i + r]
    a1 = pltpu.roll(y, LANES - l, 1)         # a1[i,c] = y[i,(c+l)%128]
    a2 = pltpu.roll(a1, WIN_ROWS - 1, 0)     # a2[i] = a1[i+1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (WIN_ROWS, LANES), 1)
    out = jnp.where(lane < LANES - l, a1, a2)
    return out[:t_rows]


def _merge_kernel(t: int):
    two_t = 2 * t
    t_rows = t // LANES
    rows2 = two_t // LANES
    n_stages = int(two_t).bit_length() - 1  # log2(2t)

    n_in = 3 * 2 * WIN_BLKS

    def kernel(a_blk, b_blk, a_ofs, b_ofs, na_ref, nb_ref, *refs):
        # refs: n_in input block refs (3 cols x [A window blocks,
        # B window blocks]), then 3 output refs
        i = pl.program_id(0)
        ins = refs[:n_in]
        o_hi, o_lo, o_cnt = refs[n_in:n_in + 3]

        cols = []
        for c in range(3):
            a_blocks = [ins[c * 2 * WIN_BLKS + j]
                        for j in range(WIN_BLKS)]
            b_blocks = [ins[c * 2 * WIN_BLKS + WIN_BLKS + j]
                        for j in range(WIN_BLKS)]
            a_win = jnp.concatenate([b_[:] for b_ in a_blocks], axis=0)
            b_win = jnp.concatenate([b_[:] for b_ in b_blocks], axis=0)
            a_tile = _align_window(a_win, a_ofs[i] % BLK, t_rows)
            b_tile = _align_window(b_win, b_ofs[i] % BLK, t_rows)
            cols.append(jnp.concatenate([a_tile, b_tile], axis=0))
        hi, lo, cnt = cols

        na = na_ref[i]
        nb = nb_ref[i]
        idx = jax.lax.broadcasted_iota(jnp.int32, (rows2, LANES), 0) \
            * LANES + jax.lax.broadcasted_iota(
                jnp.int32, (rows2, LANES), 1)
        # mask over-fetched rows: A rows >= na; reversed-B rows are
        # valid only in the LAST nb slots of their half
        invalid = ((idx < t) & (idx >= na)) | \
            ((idx >= t) & (idx < two_t - nb))
        hi = jnp.where(invalid, SENT_B, hi)
        lo = jnp.where(invalid, SENT_B, lo)
        cnt = jnp.where(invalid, 0, cnt)

        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows2, LANES), 0)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (rows2, LANES), 1)

        for st in range(n_stages):
            s = two_t >> (st + 1)
            # partner = index XOR s; rolls take non-negative shifts,
            # so "look ahead by s" = roll by (size - s)
            if s >= LANES:
                sr = s // LANES
                fwd = (row_ids & sr) == 0
                ahead, behind = rows2 - sr, sr
                axis = 0
            else:
                fwd = (lane_ids & s) == 0
                ahead, behind = LANES - s, s
                axis = 1
            p_hi = jnp.where(fwd, pltpu.roll(hi, ahead, axis),
                             pltpu.roll(hi, behind, axis))
            p_lo = jnp.where(fwd, pltpu.roll(lo, ahead, axis),
                             pltpu.roll(lo, behind, axis))
            p_cnt = jnp.where(fwd, pltpu.roll(cnt, ahead, axis),
                              pltpu.roll(cnt, behind, axis))
            # strict comparisons both ways: equal keys never swap, so
            # count payloads are exchanged, never duplicated.
            # (logical ops, not where(): Mosaic cannot select between
            # i1 vectors — "unsupported target bitwidth")
            p_lt = _lex_lt(p_hi, p_lo, hi, lo)
            s_lt = _lex_lt(hi, lo, p_hi, p_lo)
            swap = (fwd & p_lt) | (~fwd & s_lt)
            hi = jnp.where(swap, p_hi, hi)
            lo = jnp.where(swap, p_lo, lo)
            cnt = jnp.where(swap, p_cnt, cnt)

        # smallest t rows = the output tile
        o_hi[:] = hi[:t_rows]
        o_lo[:] = lo[:t_rows]
        o_cnt[:] = cnt[:t_rows]

    return kernel


def _pad_2d(x, total: int, fill):
    """(L,) -> (total//128, 128) int32 2-D with fill tail (L static)."""
    out = jnp.concatenate(
        [x, jnp.full(total - x.shape[0], fill, jnp.int32)])
    return out.reshape(total // LANES, LANES)


@functools.partial(jax.jit, static_argnums=(8,))
def _merge_device(a_hi, a_lo, a_cnt, b_hi, b_lo, b_cnt,
                  n, m, interpret: bool):
    """n, m are TRACED live counts; shapes derive from the (static)
    array capacities, so batches of the same capacity share a compile.
    Rows beyond the live counts must already be sentinels (the
    PackedTable invariant)."""
    t = TILE
    cap_a = a_hi.shape[0]
    cap_b = b_hi.shape[0]
    n_tiles = max((cap_a + cap_b + t - 1) // t, 1)
    n = jnp.minimum(jnp.asarray(n, jnp.int32), cap_a)
    m = jnp.minimum(jnp.asarray(m, jnp.int32), cap_b)

    def rup(x, mlt):
        return ((x + mlt - 1) // mlt) * mlt

    la = rup(cap_a + WIN_BLKS * BLK + BLK, BLK)
    lb = rup(cap_b + t + WIN_BLKS * BLK + BLK, BLK)

    ah = _pad_2d(_to_biased(a_hi), la, SENT_B)
    al = _pad_2d(_to_biased(a_lo), la, SENT_B)
    ac = _pad_2d(a_cnt.astype(jnp.int32), la, 0)
    # reversed B (rows beyond m are already sentinels)
    bh1 = _to_biased(b_hi)
    bl1 = _to_biased(b_lo)
    bc1 = b_cnt.astype(jnp.int32)
    lb0 = cap_b + t  # static flip length (t extra sentinel tail)
    brh = _pad_2d(jnp.flip(jnp.concatenate(
        [bh1, jnp.full(t, SENT_B, jnp.int32)])), lb, SENT_B)
    brl = _pad_2d(jnp.flip(jnp.concatenate(
        [bl1, jnp.full(t, SENT_B, jnp.int32)])), lb, SENT_B)
    brc = _pad_2d(jnp.flip(jnp.concatenate(
        [bc1, jnp.zeros(t, jnp.int32)])), lb, 0)

    a_at = _splits(ah.reshape(-1), al.reshape(-1), bh1, bl1, n, m, t,
                   n_tiles)
    b_at = jnp.minimum(jnp.arange(n_tiles + 1, dtype=jnp.int32) * t,
                       n + m) - a_at
    a_ofs = a_at[:-1]
    # reversed-B offsets: tile[j] needs B[b0+t-1-j]; with
    # b_rev = flip(Bp) of static length lb0, that flip index is
    # lb0 - t - b0 + j (rows beyond m are sentinels in place, so no
    # live-count adjustment is needed)
    b_ofs = lb0 - t - b_at[:-1]
    na = a_at[1:] - a_at[:-1]
    nb = b_at[1:] - b_at[:-1]
    a_blk = a_ofs // BLK
    b_blk = b_ofs // BLK

    t_rows = t // LANES

    def a_map(j):
        return lambda i, ab, bb, ao, bo, na_, nb_: (ab[i] + j, 0)

    def b_map(j):
        return lambda i, ab, bb, ao, bo, na_, nb_: (bb[i] + j, 0)

    in_specs = []
    for _c in range(3):
        for j in range(WIN_BLKS):
            in_specs.append(pl.BlockSpec(
                (BLK_ROWS, LANES), a_map(j), memory_space=pltpu.VMEM))
        for j in range(WIN_BLKS):
            in_specs.append(pl.BlockSpec(
                (BLK_ROWS, LANES), b_map(j), memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((t_rows, LANES),
                         lambda i, *_refs: (i, 0),
                         memory_space=pltpu.VMEM)] * 3,
    )
    inputs = []
    for col_a, col_b in ((ah, brh), (al, brl), (ac, brc)):
        inputs += [col_a] * WIN_BLKS + [col_b] * WIN_BLKS
    out = pl.pallas_call(
        _merge_kernel(t),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * t_rows, LANES), jnp.int32),
        ] * 3,
        interpret=interpret,
    )(a_blk, b_blk, a_ofs, b_ofs, na, nb, *inputs)
    hi, lo, cnt = (o.reshape(-1) for o in out)
    return hi, lo, cnt


_FORCE_INTERPRET = False  # test hook: run the kernel interpreted


def merge_sorted_rows(a_rows, a_count, b_rows, b_count,
                      n, m, interpret: bool = False):
    """Public entry: merge two sorted 2-lane packed-row arrays with
    counts.  a_rows (Na, 2) uint32 (rows [0,n) live), b_rows (Nb, 2).
    Returns (rows (L, 2) uint32, count (L,) int32) with L >= n+m,
    sentinel rows after position n+m."""
    hi, lo, cnt = _merge_device(
        a_rows[:, 0], a_rows[:, 1], a_count,
        b_rows[:, 0], b_rows[:, 1], b_count, n, m,
        interpret or _FORCE_INTERPRET)
    return jnp.stack([_from_biased(hi), _from_biased(lo)],
                     axis=-1), cnt


def available() -> bool:
    import jax

    return jax.default_backend() not in ("cpu",)
