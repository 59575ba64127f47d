"""ctypes binding for the native FASTA/FASTQ batch decoder
(csrc/fastx_decoder.cpp) — the C++ replacement for the reference's
readseq1by1.c + aio read-ahead.  Compiled on demand with g++ (zlib
linked); falls back to the pure-Python readers when no toolchain is
available."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "csrc", "fastx_decoder.cpp")
_SO = os.path.join(_REPO, "csrc", "libfastx.so")

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
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO, "-lz"],
                check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.fastx_open.restype = ctypes.c_void_p
    lib.fastx_open.argtypes = [ctypes.c_char_p]
    lib.fastx_next_batch.restype = ctypes.c_long
    lib.fastx_next_batch.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_long, ctypes.c_long]
    lib.fastx_close.restype = None
    lib.fastx_close.argtypes = [ctypes.c_void_p]
    lib.pack2bit.restype = ctypes.c_long
    lib.pack2bit.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_long, ctypes.c_long,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_long]
    _lib = lib
    return _lib


def pack2bit(codes: np.ndarray, ncap: int
             ) -> "Optional[Tuple[np.ndarray, np.ndarray, int]]":
    """Native 4-bases/byte pack + N-position sideband; None when the
    library is unavailable or the batch has more Ns than ncap (caller
    uploads raw u8).  See readpack.pack_reads for the contract."""
    lib = _load()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint8)
    r, l = codes.shape
    out = np.empty((r, (l + 3) // 4), np.uint8)
    n_flat = np.empty(ncap, np.int32)
    n = lib.pack2bit(codes, r, l, out, n_flat, ncap)
    if n < 0:
        return None
    n_flat[n:] = r * l
    return out, n_flat, int(n)


def available() -> bool:
    return _load() is not None


def read_batches(path: str, batch_size: int, max_len: int
                 ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (codes (B, L) uint8, lengths (B,) int32) until EOF.
    The final batch is zero-length-padded to batch_size."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    h = lib.fastx_open(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        while True:
            codes = np.full((batch_size, max_len), 4, np.uint8)
            lengths = np.zeros(batch_size, np.int32)
            n = lib.fastx_next_batch(h, codes, lengths,
                                     batch_size, max_len)
            if n < 0:
                raise ValueError(f"{path}: malformed FASTA/FASTQ")
            if n == 0:
                return
            yield codes, lengths
            if n < batch_size:
                return
    finally:
        lib.fastx_close(h)
