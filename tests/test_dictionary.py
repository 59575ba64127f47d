"""KmerTable build/merge/lookup vs. a Python dict oracle
(semantics of put_kmerset/search_kmerset, reference src/newhash.c)."""

import collections

import numpy as np
import pytest
import jax.numpy as jnp

from soapdenovo_trans_tpu.ops import bits, dictionary, kmer


def dict_oracle(seqs, k):
    """Canonical kmer -> (count, l_cov[4], r_cov[4]) via plain Python."""
    table = {}
    for s in seqs:
        for j in range(len(s) - k + 1):
            win = s[j : j + k]
            if "N" in win:
                continue
            rc = bits.revcomp_str(win)
            use_rc = bits.kmer_from_string(rc).tolist() < bits.kmer_from_string(win).tolist()
            can = rc if use_rc else win
            prev_f = s[j - 1] if j > 0 else None
            next_f = s[j + k] if j + k < len(s) else None
            if use_rc:
                pc = bits.revcomp_str(next_f) if next_f else None
                nc = bits.revcomp_str(prev_f) if prev_f else None
            else:
                pc, nc = prev_f, next_f
            cnt, l, r = table.setdefault(can, [0, [0] * 4, [0] * 4])
            table[can][0] += 1
            if pc and pc != "N":
                code = int(bits.encode_seq(pc)[0])
                l[code] = min(l[code] + 1, dictionary.MAX_KMER_COV)
            if nc and nc != "N":
                code = int(bits.encode_seq(nc)[0])
                r[code] = min(r[code] + 1, dictionary.MAX_KMER_COV)
    return table


def make_stream(seqs, k):
    max_len = max(len(s) for s in seqs)
    padded = np.full((len(seqs), max_len), 4, dtype=np.uint8)
    lens = []
    for i, s in enumerate(seqs):
        padded[i, : len(s)] = bits.encode_seq(s)
        lens.append(len(s))
    return kmer.chop_reads(jnp.asarray(padded), jnp.asarray(lens), k)


@pytest.mark.parametrize("k", [13, 23, 31])
def test_build_matches_dict(k, rng):
    seqs = ["".join(rng.choice(list("ACGT"), size=int(rng.integers(k, 80))))
            for _ in range(20)]
    table = dictionary.build(make_stream(seqs, k), k)
    oracle = dict_oracle(seqs, k)

    n = int(table.n)
    assert n == len(oracle)
    keys = np.asarray(table.keys[:n])
    counts = np.asarray(table.count[:n])
    l_cov = np.asarray(table.l_cov[:n])
    r_cov = np.asarray(table.r_cov[:n])
    # ascending unique keys
    for i in range(1, n):
        assert keys[i].tolist() > keys[i - 1].tolist()
    for i in range(n):
        s = bits.kmer_to_string(keys[i], k)
        cnt, l, r = oracle[s]
        assert counts[i] == cnt, s
        assert l_cov[i].tolist() == l, s
        assert r_cov[i].tolist() == r, s


def test_merge_matches_single_build(rng):
    k = 23
    seqs = ["".join(rng.choice(list("ACGT"), size=60)) for _ in range(30)]
    whole = dictionary.build(make_stream(seqs, k), k)
    # the streaming path: per-batch packed builds, LSM merge, one
    # finalize at the end (what stages/pregraph actually runs)
    t1 = dictionary.build_packed(make_stream(seqs[:11], k), k)
    t2 = dictionary.build_packed(make_stream(seqs[11:], k), k)
    merged = dictionary.finalize(dictionary.merge_packed(t1, t2), k)
    n = int(whole.n)
    assert int(merged.n) == n
    assert np.array_equal(np.asarray(merged.keys[:n]), np.asarray(whole.keys[:n]))
    assert np.array_equal(np.asarray(merged.count[:n]), np.asarray(whole.count[:n]))
    assert np.array_equal(np.asarray(merged.l_cov[:n]), np.asarray(whole.l_cov[:n]))
    assert np.array_equal(np.asarray(merged.r_cov[:n]), np.asarray(whole.r_cov[:n]))


def test_merge_finalize_matches_single_build(rng):
    """merge_finalize (final merge fused into finalize, NO dedup pass
    between) must equal the whole-input build byte for byte."""
    k = 23
    seqs = ["".join(rng.choice(list("ACGT"), size=60)) for _ in range(30)]
    whole = dictionary.build(make_stream(seqs, k), k)
    t1 = dictionary.build_packed(make_stream(seqs[:7], k), k)
    t2 = dictionary.build_packed(make_stream(seqs[7:], k), k)
    merged = dictionary.merge_finalize(t1, t2, k)
    n = int(whole.n)
    assert int(merged.n) == n
    for a, b in [(merged.keys, whole.keys), (merged.count, whole.count),
                 (merged.l_cov, whole.l_cov), (merged.r_cov, whole.r_cov)]:
        assert np.array_equal(np.asarray(a[:n]), np.asarray(b[:n]))


def test_lookup(rng):
    k = 23
    seqs = ["".join(rng.choice(list("ACGT"), size=60)) for _ in range(10)]
    table = dictionary.build(make_stream(seqs, k), k)
    n = int(table.n)
    # every present key found at its own row
    idx = dictionary.lookup(table.keys, table.keys[:n])
    assert np.array_equal(np.asarray(idx), np.arange(n))
    # absent keys -> -1
    absent = []
    oracle = dict_oracle(seqs, k)
    while len(absent) < 5:
        s = "".join(rng.choice(list("ACGT"), size=k))
        can = min(s, bits.revcomp_str(s),
                  key=lambda x: bits.kmer_from_string(x).tolist())
        if can not in oracle:
            absent.append(bits.kmer_from_string(can))
    idx2 = dictionary.lookup(table.keys, jnp.asarray(np.stack(absent)))
    assert np.all(np.asarray(idx2) == -1)
