"""chop_reads vs. a naive per-string reference implementation
(semantics of chopKmer4read, reference src/prlHashReads.c:164-310)."""

import numpy as np
import pytest
import jax.numpy as jnp

from soapdenovo_trans_tpu.ops import bits, kmer


def naive_chop(seq: str, k: int):
    """All canonical k-mers of seq with canonical-orientation prev/next."""
    out = []
    for j in range(len(seq) - k + 1):
        win = seq[j : j + k]
        if "N" in win:
            out.append(None)
            continue
        rc = bits.revcomp_str(win)
        prev_f = seq[j - 1] if j > 0 else "N"
        next_f = seq[j + k] if j + k < len(seq) else "N"
        use_rc = bits.kmer_from_string(rc).tolist() < bits.kmer_from_string(win).tolist()
        if use_rc:
            can = rc
            prev_c = bits.revcomp_str(next_f) if next_f != "N" else "N"
            next_c = bits.revcomp_str(prev_f) if prev_f != "N" else "N"
        else:
            can, prev_c, next_c = win, prev_f, next_f
        out.append((can, prev_c, next_c))
    return out


@pytest.mark.parametrize("k", [13, 23, 31, 63])
def test_chop_matches_naive(k, rng):
    max_len = 100
    n_reads = 8
    seqs, lens = [], []
    for i in range(n_reads):
        ln = int(rng.integers(k, max_len + 1))
        s = "".join(rng.choice(list("ACGTACGTN"), size=ln))  # some Ns
        seqs.append(s)
        lens.append(ln)
    padded = np.full((n_reads, max_len), 4, dtype=np.uint8)
    for i, s in enumerate(seqs):
        padded[i, : lens[i]] = bits.encode_seq(s)

    stream = kmer.chop_reads(jnp.asarray(padded), jnp.asarray(lens), k)
    num_win = max_len - k + 1
    kms = np.asarray(stream.kmers).reshape(n_reads, num_win, -1)
    prev = np.asarray(stream.prev).reshape(n_reads, num_win)
    nxt = np.asarray(stream.next).reshape(n_reads, num_win)
    valid = np.asarray(stream.valid).reshape(n_reads, num_win)

    for i, s in enumerate(seqs):
        expect = naive_chop(s, k)
        for j in range(num_win):
            if j >= len(expect) or expect[j] is None:
                assert not valid[i, j], (i, j)
                continue
            can, pc, nc = expect[j]
            assert valid[i, j], (i, j)
            assert bits.kmer_to_string(kms[i, j], k) == can, (i, j)
            exp_p = 4 if pc == "N" else bits.encode_seq(pc)[0]
            exp_n = 4 if nc == "N" else bits.encode_seq(nc)[0]
            assert prev[i, j] == exp_p, (i, j, s)
            assert nxt[i, j] == exp_n, (i, j, s)


def test_read_id_pos_layout(rng):
    k = 13
    padded = np.full((3, 20), 4, dtype=np.uint8)
    padded[:, :16] = rng.integers(0, 4, size=(3, 16), dtype=np.uint8)
    stream = kmer.chop_reads(jnp.asarray(padded), jnp.asarray([16, 16, 16]), k)
    num_win = 20 - k + 1
    rid = np.asarray(stream.read_id)
    pos = np.asarray(stream.pos)
    assert rid.tolist() == sum([[i] * num_win for i in range(3)], [])
    assert pos.tolist() == list(range(num_win)) * 3
