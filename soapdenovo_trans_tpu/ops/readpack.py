"""2-bit packed host->device read transfer.

The tunneled chip's H2D path measures ~50-80 MB/s (tools/
prof_primitives.py); raw u8 base codes make read upload a dominant
cost of the counting phase at depth (a 20 MB batch is ~0.4 s — more
than its entire device build).  Reads are packed 4 bases/byte on the
host with vectorized numpy and unpacked on device inside the
consuming jit.  'N' bases (code 4) don't fit 2 bits, so their flat
positions (row*l + col) ride in a sparse int32 sideband whose
capacity is a fixed function of the batch shape (keeps one compiled
program); batches with more N than that (>~0.2% of bases) fall back
to raw u8.

The reference reads bases one char at a time into per-thread buffers
(src/readseq1by1.c:865-1222); the transfer-compression concern is
TPU-rig-specific and has no reference analogue.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class PackedReads(NamedTuple):
    data: np.ndarray    # (r, ceil(l/4)) uint8 — 4 bases per byte, LSB first
    n_flat: np.ndarray  # (ncap,) int32 flat (row*l+col) of N bases; r*l = none
    l: int              # unpacked read width


def n_cap_for(r: int, l: int) -> int:
    """Sideband capacity as a pure function of the batch shape."""
    return 1024 + (r * l) // 512


def pack_reads(codes: np.ndarray) -> Optional[PackedReads]:
    """Host-side 4x compression; None if the batch has too many Ns
    for the shape-determined sideband (caller sends raw u8)."""
    r, l = codes.shape
    ncap = n_cap_for(r, l)
    # native packer when available: the numpy formulation below runs
    # at ~90 MB/s on this 2-vCPU host and competes with the tunnel
    # relay process for cores (csrc/fastx_decoder.cpp pack2bit)
    from ..io import native

    nat = native.pack2bit(codes, ncap)
    if nat is not None:
        data, n_flat, _ = nat
        return PackedReads(data, n_flat, l)
    n_mask = codes >= 4
    n_total = int(np.count_nonzero(n_mask))
    if n_total > ncap:
        return None
    if l % 4:
        lp = -(-l // 4) * 4
        c = np.zeros((r, lp), np.uint8)
        np.bitwise_and(codes, 3, out=c[:, :l])
    else:
        c = codes & 3
    v = c.reshape(r, -1, 4)
    data = v[:, :, 0] | (v[:, :, 1] << 2) | (v[:, :, 2] << 4) \
        | (v[:, :, 3] << 6)
    n_flat = np.full(ncap, r * l, np.int32)
    if n_total:
        nr, nc = np.nonzero(n_mask)
        n_flat[:n_total] = (nr * l + nc).astype(np.int32)
    return PackedReads(np.ascontiguousarray(data), n_flat, l)


def unpack_reads(data: jnp.ndarray, n_flat: jnp.ndarray,
                 l: int) -> jnp.ndarray:
    """Device-side unpack (call inside the consuming jit): -> (r, l)
    uint8 codes with N positions restored to 4."""
    r = data.shape[0]
    codes = jnp.stack(
        [(data >> s) & 3 for s in (0, 2, 4, 6)],
        axis=-1).reshape(r, -1)[:, :l].astype(jnp.uint8)
    flat = codes.reshape(-1).at[n_flat].set(jnp.uint8(4), mode="drop")
    return flat.reshape(r, l)
