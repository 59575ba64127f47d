"""Property tests: multiword k-mer ops vs. naive string implementations.

Mirrors the closed-form behaviors of reference src/kmer.c (nextKmer,
prevKmer, reverseComplement, KmerSmaller) across the K widths the
reference compiles as three separate binaries (31/63/127-mer)."""

import numpy as np
import pytest

import jax.numpy as jnp

from soapdenovo_trans_tpu.ops import bits

KS = [13, 31, 33, 63, 127]  # covers W = 1, 2, 3, 4, 8 uint32 lanes


def random_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.mark.parametrize("k", KS)
def test_roundtrip_string(k, rng):
    for _ in range(20):
        s = random_seq(rng, k)
        km = bits.kmer_from_string(s)
        assert bits.kmer_to_string(km, k) == s


@pytest.mark.parametrize("k", KS)
def test_next_prev_kmer(k, rng):
    s = random_seq(rng, k + 1)
    km = jnp.asarray(bits.kmer_from_string(s[:k]))[None]
    b = bits.encode_seq(s[k])[0]
    nxt = bits.next_kmer(km, jnp.asarray([b]), k)
    assert bits.kmer_to_string(np.asarray(nxt[0]), k) == s[1 : k + 1]

    km2 = jnp.asarray(bits.kmer_from_string(s[1 : k + 1]))[None]
    b2 = bits.encode_seq(s[0])[0]
    prv = bits.prev_kmer(km2, jnp.asarray([b2]), k)
    assert bits.kmer_to_string(np.asarray(prv[0]), k) == s[:k]


@pytest.mark.parametrize("k", KS)
def test_reverse_complement(k, rng):
    ss = [random_seq(rng, k) for _ in range(16)]
    kms = jnp.asarray(np.stack([bits.kmer_from_string(s) for s in ss]))
    rcs = bits.reverse_complement(kms, k)
    for i, s in enumerate(ss):
        assert bits.kmer_to_string(np.asarray(rcs[i]), k) == bits.revcomp_str(s)
    # involution
    back = bits.reverse_complement(rcs, k)
    assert np.array_equal(np.asarray(back), np.asarray(kms))


@pytest.mark.parametrize("k", KS)
def test_lex_less_matches_bigint(k, rng):
    ss = [random_seq(rng, k) for _ in range(32)]
    kms = np.stack([bits.kmer_from_string(s) for s in ss])

    def to_int(km):
        v = 0
        for w in km:
            v = (v << 32) | int(w)
        return v

    a = jnp.asarray(kms[:16])
    b = jnp.asarray(kms[16:])
    less = np.asarray(bits.lex_less(a, b))
    for i in range(16):
        assert less[i] == (to_int(kms[i]) < to_int(kms[16 + i]))


@pytest.mark.parametrize("k", [13, 23, 31, 63])
def test_canonical(k, rng):
    ss = [random_seq(rng, k) for _ in range(16)]
    kms = jnp.asarray(np.stack([bits.kmer_from_string(s) for s in ss]))
    can, use_rc = bits.canonical(kms, k)
    for i, s in enumerate(ss):
        expect = min(s, bits.revcomp_str(s),
                     key=lambda x: bits.kmer_from_string(x).tolist())
        got = bits.kmer_to_string(np.asarray(can[i]), k)
        assert got == expect


@pytest.mark.parametrize("k", [23, 31, 63])
def test_first_last_base_and_append(k, rng):
    s = random_seq(rng, k)
    km = jnp.asarray(bits.kmer_from_string(s))[None]
    assert bits.BASE_CHARS[int(bits.first_base(km, k)[0])] == s[0]
    assert bits.BASE_CHARS[int(bits.last_base(km)[0])] == s[-1]
    for pos in [0, 1, k // 2, k - 1]:
        got = bits.get_base(km, jnp.asarray([pos]), k)[0]
        assert bits.BASE_CHARS[int(got)] == s[pos]
    plus = bits.append_base(km, jnp.asarray([1], dtype=jnp.uint32), k)
    assert bits.kmer_to_string(np.asarray(plus[0]), k + 1) == s + "C"
