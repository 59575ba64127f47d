"""Merge-path kernel vs numpy merge (kernels/merge_path.py,
interpret mode — the compiled path is exercised on the TPU by
bench.py and gated off on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from soapdenovo_trans_tpu.kernels import merge_path


def _rand_sorted(rng, n, dup_rate=0.3):
    hi = rng.integers(0, 50 if dup_rate else 2**32, n).astype(np.uint64)
    lo = rng.integers(0, 20 if dup_rate else 2**32, n).astype(np.uint64)
    v = (hi << np.uint64(32)) | lo
    v.sort()
    rows = np.stack([(v >> np.uint64(32)).astype(np.uint32),
                     (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)],
                    axis=-1)
    cnt = rng.integers(1, 100, n).astype(np.int32)
    return rows, cnt, v


@pytest.mark.parametrize("n,m,dup", [
    (5000, 3000, 0.0),
    (4096, 4096, 0.3),   # heavy duplicates
    (1, 7000, 0.0),      # extreme imbalance
    (6000, 0, 0.0),      # empty side
    (2048, 2048, 1.0),   # all keys from a tiny space
])
def test_merge_matches_numpy(rng, n, m, dup):
    rng2 = np.random.default_rng(42 + n + m)
    a_rows, a_cnt, av = _rand_sorted(rng2, max(n, 1), dup)
    b_rows, b_cnt, bv = _rand_sorted(rng2, max(m, 1), dup)

    rows, cnt = merge_path.merge_sorted_rows(
        jnp.asarray(a_rows), jnp.asarray(a_cnt),
        jnp.asarray(b_rows), jnp.asarray(b_cnt), n, m, interpret=True)
    rows = np.asarray(rows)
    cnt = np.asarray(cnt)

    got_v = (rows[:, 0].astype(np.uint64) << np.uint64(32)) | \
        rows[:, 1].astype(np.uint64)
    want_v = np.sort(np.concatenate([av[:n], bv[:m]]))
    total = n + m
    np.testing.assert_array_equal(got_v[:total], want_v)
    # sentinel tail
    assert (rows[total:] == 0xFFFFFFFF).all()
    # counts are a permutation within equal-key runs: compare summed
    # counts per distinct key
    want_cnt = {}
    for v, c in zip(av[:n], a_cnt[:n]):
        want_cnt[v] = want_cnt.get(v, 0) + int(c)
    for v, c in zip(bv[:m], b_cnt[:m]):
        want_cnt[v] = want_cnt.get(v, 0) + int(c)
    got_cnt = {}
    for v, c in zip(got_v[:total], cnt[:total]):
        got_cnt[int(v)] = got_cnt.get(int(v), 0) + int(c)
    assert got_cnt == want_cnt


def test_merge_packed_kernel_path_matches_sort(rng, monkeypatch):
    """dictionary.merge_packed via the kernel (interpret) must equal
    the legacy sort path on real PackedTables built from k-mer data."""
    import jax.numpy as jnp2

    from soapdenovo_trans_tpu.ops import bits, dictionary, kmer
    from soapdenovo_trans_tpu.kernels import merge_path as mp

    K = 23
    rng2 = np.random.default_rng(5)

    def table_from_reads(n_reads):
        codes = rng2.integers(0, 4, size=(n_reads, 60)).astype(np.uint8)
        lens = np.full(n_reads, 60, np.int32)
        stream = kmer.chop_reads(jnp2.asarray(codes),
                                 jnp2.asarray(lens), K)
        return dictionary.build_packed(stream, K)

    a = table_from_reads(300)
    b = table_from_reads(200)

    legacy = dictionary.merge_packed(a, b)

    monkeypatch.setattr(dictionary, "_use_merge_kernel",
                        lambda wp: wp == 2)
    monkeypatch.setattr(mp, "_FORCE_INTERPRET", True)
    kern = dictionary.merge_packed(a, b)

    assert int(kern.n) == int(legacy.n)
    n = int(legacy.n)
    np.testing.assert_array_equal(np.asarray(kern.rows[:n]),
                                  np.asarray(legacy.rows[:n]))
    np.testing.assert_array_equal(np.asarray(kern.count[:n]),
                                  np.asarray(legacy.count[:n]))


def test_merge_finalize_kernel_path_matches_sort(rng, monkeypatch):
    """merge_finalize via the merge kernel (interpret mode) must equal
    finalize(merge_packed(a, b)) on real PackedTables — the fused
    final-merge path previously had coverage only through the CPU
    concat+sort fallback (ADVICE r3)."""
    import jax.numpy as jnp2

    from soapdenovo_trans_tpu.ops import dictionary, kmer
    from soapdenovo_trans_tpu.kernels import merge_path as mp

    K = 23
    rng2 = np.random.default_rng(9)

    def table_from_reads(n_reads):
        codes = rng2.integers(0, 4, size=(n_reads, 60)).astype(np.uint8)
        lens = np.full(n_reads, 60, np.int32)
        stream = kmer.chop_reads(jnp2.asarray(codes),
                                 jnp2.asarray(lens), K)
        return dictionary.build_packed(stream, K)

    a = table_from_reads(300)
    b = table_from_reads(200)

    ref = dictionary.finalize(dictionary.merge_packed(a, b), K)

    monkeypatch.setattr(dictionary, "_use_merge_kernel",
                        lambda wp: wp == 2)
    monkeypatch.setattr(mp, "_FORCE_INTERPRET", True)
    fused = dictionary.merge_finalize(a, b, K)

    assert int(fused.n) == int(ref.n)
    n = int(ref.n)
    for field in ("keys", "count", "l_cov", "r_cov"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fused, field)[:n]),
            np.asarray(getattr(ref, field)[:n]), err_msg=field)
