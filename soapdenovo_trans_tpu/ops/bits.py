"""Multiword 2-bit-packed k-mer arithmetic on uint32 lanes.

TPU-native replacement for the reference's scalar Kmer structs
(reference: src/kmer.c, src/inc/def.h:45-59 — u64 for MER31, 2xu64 for
MER63, 4xu64 for MER127, with every op triplicated under #ifdef).

Here a k-mer is a ``(..., W) uint32`` array, ``W = ceil(2K / 32)``,
word 0 most significant.  The k-mer value occupies the LOW ``2K`` bits
of the W*32-bit integer (matching the reference layout), with the
FIRST base of the k-mer in the most-significant 2-bit slot of those 2K
bits.  Because word 0 is the most-significant word, *lexicographic*
comparison over the word axis equals *numeric* comparison of the
packed value — which is exactly what ``jax.lax.sort`` with
``num_keys=W`` gives us.  One parameterized implementation covers all
K in 13..127 (vs. the reference's three compile-time binaries).

Base encoding matches the reference (src/inc/def.h:39):
A=0, C=1, T=2, G=3, N/absent=4;  complement(b) = b ^ 2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BASE_CHARS = "ACTG"  # index == base code (reference int2base)
BASE_N = 4  # 'N' / invalid / absent marker

# Lookup table: ASCII byte -> base code (anything unknown -> 4).
_CHAR2CODE = np.full(256, BASE_N, dtype=np.uint8)
for _i, _c in enumerate(BASE_CHARS):
    _CHAR2CODE[ord(_c)] = _i
    _CHAR2CODE[ord(_c.lower())] = _i


def words_for_k(k: int) -> int:
    """Number of uint32 lanes needed for a K-mer (2 bits/base)."""
    return (2 * k + 31) // 32


def mask_np(k: int) -> np.ndarray:
    """(W,) uint32 mask selecting the low 2K bits of the multiword int."""
    w = words_for_k(k)
    bits = 2 * k
    out = np.zeros(w, dtype=np.uint32)
    for i in range(w):
        # word i holds bits [32*(w-1-i), 32*(w-i)) of the big integer
        lo_bit = 32 * (w - 1 - i)
        used = min(32, max(0, bits - lo_bit))
        out[i] = np.uint32((1 << used) - 1) if used < 32 else np.uint32(0xFFFFFFFF)
    return out


def zero(k: int, shape=()) -> jnp.ndarray:
    return jnp.zeros(shape + (words_for_k(k),), dtype=jnp.uint32)


def _shl2(km: jnp.ndarray) -> jnp.ndarray:
    """Shift the multiword value left by 2 bits (overflow dropped)."""
    hi = km << 2
    carry = km >> 30  # top 2 bits of each word move up one word
    carry = jnp.concatenate(
        [carry[..., 1:], jnp.zeros_like(carry[..., :1])], axis=-1
    )
    return hi | carry


def _shr2(km: jnp.ndarray) -> jnp.ndarray:
    """Shift the multiword value right by 2 bits."""
    lo = km >> 2
    carry = (km & 3) << 30
    carry = jnp.concatenate(
        [jnp.zeros_like(carry[..., :1]), carry[..., :-1]], axis=-1
    )
    return lo | carry


def next_kmer(km: jnp.ndarray, base, k: int) -> jnp.ndarray:
    """Append ``base`` on the right, dropping the leftmost base.

    Reference: nextKmer, src/kmer.c:209.
    ``base``: (...,) integer array or scalar with values 0..3.
    """
    shifted = _shl2(km)
    # & 3: an N code (4) must not leak a stray bit into neighbor slots —
    # windows containing N are masked by the caller, but the rolled word
    # itself must stay clean for the windows that follow.
    b = jnp.asarray(base, dtype=jnp.uint32)[..., None] & 3
    last = jnp.zeros_like(km).at[..., -1].set(b[..., 0])
    return (shifted | last) & jnp.asarray(mask_np(k))


def prev_kmer(km: jnp.ndarray, base, k: int) -> jnp.ndarray:
    """Prepend ``base`` on the left, dropping the rightmost base.

    Reference: prevKmer, src/kmer.c:230.
    """
    w = words_for_k(k)
    shifted = _shr2(km)
    p = 2 * k - 2  # bit position (from LSB) of the first base's low bit
    word_idx = w - 1 - p // 32
    shift = p % 32
    b = jnp.asarray(base, dtype=jnp.uint32) & 3  # see next_kmer re: N codes
    return shifted.at[..., word_idx].set(shifted[..., word_idx] | (b << shift))


def _reverse_pairs_in_word(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse the order of the 16 2-bit groups inside each uint32."""
    x = (x >> 16) | (x << 16)
    x = ((x >> 8) & jnp.uint32(0x00FF00FF)) | ((x & jnp.uint32(0x00FF00FF)) << 8)
    x = ((x >> 4) & jnp.uint32(0x0F0F0F0F)) | ((x & jnp.uint32(0x0F0F0F0F)) << 4)
    x = ((x >> 2) & jnp.uint32(0x33333333)) | ((x & jnp.uint32(0x33333333)) << 2)
    return x


def _shr_const(km: jnp.ndarray, s: int) -> jnp.ndarray:
    """Shift the multiword value right by a static 0 <= s < 32 bits."""
    if s == 0:
        return km
    lo = km >> s
    carry = (km << (32 - s))  # low bits of word i-1 move into word i
    carry = jnp.concatenate(
        [jnp.zeros_like(carry[..., :1]), carry[..., :-1]], axis=-1
    )
    return lo | carry


def widen(km: jnp.ndarray, w_out: int) -> jnp.ndarray:
    """Prepend zero words so the value occupies w_out uint32 lanes."""
    w_in = km.shape[-1]
    if w_out == w_in:
        return km
    assert w_out > w_in
    pad = jnp.zeros(km.shape[:-1] + (w_out - w_in,), dtype=km.dtype)
    return jnp.concatenate([pad, km], axis=-1)


def shl_const(km: jnp.ndarray, s: int) -> jnp.ndarray:
    """Shift the multiword value left by a static 0 <= s < 32 bits
    (overflow beyond word 0 is dropped — widen() first if needed)."""
    if s == 0:
        return km
    hi = km << s
    carry = km >> (32 - s)
    carry = jnp.concatenate(
        [carry[..., 1:], jnp.zeros_like(carry[..., :1])], axis=-1)
    return hi | carry


def reverse_complement(km: jnp.ndarray, k: int) -> jnp.ndarray:
    """Branchless reverse complement.

    Reference: fastReverseComp, src/kmer.c:548-646 (XOR 0xAAAA... then
    table-driven bit reversal).  Here: XOR (complement = b^2 per base),
    2-bit-group reversal via shift/mask ladder, word-order reversal,
    then realign to the low 2K bits.
    """
    w = words_for_k(k)
    comp = km ^ jnp.uint32(0xAAAAAAAA)
    rev = _reverse_pairs_in_word(comp)
    rev = rev[..., ::-1]
    # The k-mer now occupies the TOP 2K bits; shift down by 32W - 2K (< 32).
    s = 32 * w - 2 * k
    assert 0 <= s < 32
    return _shr_const(rev, s) & jnp.asarray(mask_np(k))


def lex_less(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a < b as multiword unsigned integers (word 0 most significant).

    Reference: KmerSmaller, src/kmer.c:27-128.
    """
    w = a.shape[-1]
    res = a[..., w - 1] < b[..., w - 1]
    for i in range(w - 2, -1, -1):
        res = (a[..., i] < b[..., i]) | ((a[..., i] == b[..., i]) & res)
    return res


def lex_eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a == b (reference: KmerEqual, src/kmer.c)."""
    return jnp.all(a == b, axis=-1)


def canonical(km: jnp.ndarray, k: int):
    """min(kmer, revcomp) plus a flag saying the revcomp was chosen.

    Reference: the KmerSmaller(word, bal_word) branch in chopKmer4read,
    src/prlHashReads.c:215-230.  K odd => km != revcomp always.
    """
    rc = reverse_complement(km, k)
    use_rc = lex_less(rc, km)
    return jnp.where(use_rc[..., None], rc, km), use_rc


def canonical_pair(km: jnp.ndarray, rc: jnp.ndarray, k: int):
    """Like :func:`canonical` but with the revcomp already computed
    (e.g. rolled incrementally alongside the forward k-mer, as the
    reference's word/bal_word pair is, src/prlHashReads.c:249-258)."""
    use_rc = lex_less(rc, km)
    return jnp.where(use_rc[..., None], rc, km), use_rc


def last_base(km: jnp.ndarray) -> jnp.ndarray:
    """Code of the k-mer's last (rightmost) base. Ref: lastCharInKmer."""
    return (km[..., -1] & 3).astype(jnp.uint8)


def first_base(km: jnp.ndarray, k: int) -> jnp.ndarray:
    """Code of the k-mer's first (leftmost) base. Ref: firstCharInKmer."""
    w = words_for_k(k)
    p = 2 * k - 2
    word_idx = w - 1 - p // 32
    shift = p % 32
    return ((km[..., word_idx] >> shift) & 3).astype(jnp.uint8)


def get_base(km: jnp.ndarray, pos, k: int) -> jnp.ndarray:
    """Base code at position ``pos`` (0 = leftmost/first base).

    ``pos`` may be a traced integer array broadcastable to km[..., 0].
    """
    w = words_for_k(k)
    p = 2 * (k - 1) - 2 * jnp.asarray(pos, dtype=jnp.int32)  # bit pos from LSB
    word_idx = (w - 1) - p // 32
    shift = (p % 32).astype(jnp.uint32)
    word = jnp.take_along_axis(km, word_idx[..., None], axis=-1)[..., 0]
    return ((word >> shift) & 3).astype(jnp.uint8)


def append_base(km: jnp.ndarray, base, k: int) -> jnp.ndarray:
    """Extend a K-mer to a (K+1)-mer by appending a base on the right.

    Reference: KmerPlus, src/kmer.c (used for length-1-edge patch
    k-mers, src/node2edge.c:419-462).  Output uses words_for_k(k+1)
    lanes: the input is widened if needed, then shifted.
    """
    w_in = words_for_k(k)
    w_out = words_for_k(k + 1)
    if w_out > w_in:
        pad = jnp.zeros(km.shape[:-1] + (w_out - w_in,), dtype=km.dtype)
        km = jnp.concatenate([pad, km], axis=-1)
    shifted = _shl2(km)
    b = jnp.asarray(base, dtype=jnp.uint32)
    out = shifted.at[..., -1].set(shifted[..., -1] | b)
    return out & jnp.asarray(mask_np(k + 1))


# ---------------------------------------------------------------------------
# Host-side (numpy) helpers, mostly for tests and IO.
# ---------------------------------------------------------------------------

def encode_seq(s: str) -> np.ndarray:
    """ASCII string -> (len,) uint8 base codes (N and unknown -> 4)."""
    return _CHAR2CODE[np.frombuffer(s.encode("ascii"), dtype=np.uint8)]


def decode_seq(codes) -> str:
    """(len,) base codes -> ASCII string (4 -> 'N')."""
    lut = np.frombuffer(b"ACTGN", dtype=np.uint8)
    return bytes(lut[np.asarray(codes, dtype=np.uint8)]).decode("ascii")


def kmer_from_string(s: str) -> np.ndarray:
    """String of length K -> (W,) uint32 packed k-mer (host side)."""
    k = len(s)
    w = words_for_k(k)
    val = 0
    for ch in s:
        val = (val << 2) | int(_CHAR2CODE[ord(ch)])
    out = np.zeros(w, dtype=np.uint32)
    for i in range(w):
        out[w - 1 - i] = np.uint32((val >> (32 * i)) & 0xFFFFFFFF)
    return out


def kmer_to_string(km, k: int) -> str:
    """(W,) uint32 packed k-mer -> string of length K (host side)."""
    km = np.asarray(km, dtype=np.uint64)
    w = len(km)
    val = 0
    for i in range(w):
        val = (val << 32) | int(km[i])
    chars = []
    for i in range(k):
        chars.append(BASE_CHARS[(val >> (2 * (k - 1 - i))) & 3])
    return "".join(chars)


def revcomp_str(s: str) -> str:
    """Host-side reverse complement over ACGT/N strings (for tests)."""
    comp = {"A": "T", "T": "A", "C": "G", "G": "C", "N": "N"}
    return "".join(comp[c] for c in reversed(s.upper()))


def interleave2(a, b):
    """Row-interleave two equal-shape arrays: out[0::2] = a,
    out[1::2] = b.  The natural jnp.stack(axis=1).reshape spelling
    crashes the TPU compile helper above ~16M rows (its (N, 2, X)
    intermediate); strided scatter-set compiles everywhere."""
    out_shape = (2 * a.shape[0],) + a.shape[1:]
    out = jnp.zeros(out_shape, a.dtype)
    return out.at[0::2].set(a).at[1::2].set(b)
