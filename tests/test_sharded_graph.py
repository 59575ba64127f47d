"""Routed sharded-graph primitives vs their dense equivalents on the
8-device CPU mesh (parallel/sharded_graph.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from soapdenovo_trans_tpu.ops import bits, dictionary, kmer
from soapdenovo_trans_tpu.parallel import sharded_count, sharded_graph
from soapdenovo_trans_tpu.ops import ranking

D = 8
K = 15


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= D, "conftest must force 8 CPU devices"
    return Mesh(np.array(devs[:D]), (sharded_graph.AXIS,))


def test_routed_gather_matches_dense(mesh, rng):
    cap, m = 64, 96
    x = rng.integers(0, 1000, size=(D, cap, 2)).astype(np.int32)
    idx = rng.integers(-2, D * cap, size=(D, m)).astype(np.int32)
    router = sharded_graph.Router(mesh, cap)
    got = np.asarray(router.gather(jnp.asarray(x), jnp.asarray(idx),
                                   n_fields=2))
    dense = x.reshape(-1, 2)
    want = np.where(idx[..., None] >= 0,
                    dense[np.clip(idx, 0, D * cap - 1)], -1)
    np.testing.assert_array_equal(got, want)


def test_routed_gather_hotspot(mesh, rng):
    """All queries target one shard — exercises the overflow retry."""
    cap, m = 32, 64
    x = rng.integers(0, 99, size=(D, cap, 1)).astype(np.int32)
    idx = np.full((D, m), 7, np.int32)  # everything to shard 0 row 7
    router = sharded_graph.Router(mesh, cap)
    got = np.asarray(router.gather(jnp.asarray(x), jnp.asarray(idx)))
    assert (got[..., 0] == x[0, 7, 0]).all()


def test_routed_scatter_add_matches_dense(mesh, rng):
    cap, m = 48, 80
    idx = rng.integers(-2, D * cap, size=(D, m)).astype(np.int32)
    vals = rng.integers(0, 10, size=(D, m, 1)).astype(np.int32)
    router = sharded_graph.Router(mesh, cap)
    got = np.asarray(router.scatter(jnp.asarray(idx), jnp.asarray(vals)))
    want = np.zeros(D * cap, np.int64)
    np.add.at(want, idx[idx >= 0].reshape(-1),
              vals[..., 0][idx >= 0].reshape(-1))
    np.testing.assert_array_equal(got.reshape(-1), want)


def test_routed_scatter_max_matches_dense(mesh, rng):
    cap, m = 48, 80
    idx = rng.integers(-2, D * cap, size=(D, m)).astype(np.int32)
    vals = rng.integers(0, 1000, size=(D, m, 1)).astype(np.int32)
    router = sharded_graph.Router(mesh, cap)
    got = np.asarray(
        router.scatter(jnp.asarray(idx), jnp.asarray(vals), op="max"))
    want = np.full(D * cap, int(sharded_graph._NEG), np.int64)
    np.maximum.at(want, idx[idx >= 0].reshape(-1),
                  vals[..., 0][idx >= 0].reshape(-1))
    np.testing.assert_array_equal(got.reshape(-1), want)


def _random_sharded_table(rng, n_keys):
    """Random canonical k-mer keys split by the counting split points.
    Returns (dense KmerTable-style keys, shard keys (D,cap,W),
    n (D,), global id of each dense row)."""
    raw = rng.integers(0, 2 ** (2 * K), size=4 * n_keys, dtype=np.uint64)
    w = bits.words_for_k(K)
    km = np.zeros((raw.shape[0], w), np.uint32)
    km[:, -1] = (raw & 0xFFFFFFFF).astype(np.uint32)
    if w > 1:
        km[:, -2] = (raw >> np.uint64(32)).astype(np.uint32) & \
            ((1 << (2 * K - 32)) - 1)
    can, _ = bits.canonical(jnp.asarray(km), K)
    can = np.unique(np.asarray(can), axis=0)[:n_keys]
    # dense sorted order == shard-major order under monotone split
    bounds = sharded_count._owner_boundaries(K, D)
    owner = np.searchsorted(bounds, can[:, 0], side="right")
    cap = dictionary.round_up(max(np.bincount(owner, minlength=D).max(), 1))
    keys = np.full((D, cap, w), 0xFFFFFFFF, np.uint32)
    n = np.zeros(D, np.int32)
    gid = np.zeros(can.shape[0], np.int32)
    for i, (o, row) in enumerate(zip(owner, can)):
        keys[o, n[o]] = row
        gid[i] = o * cap + n[o]
        n[o] += 1
    return can, keys, n, gid, cap


def test_routed_lookup_matches_dense(mesh, rng):
    can, keys, n, gid, cap = _random_sharded_table(rng, 500)
    w = can.shape[1]
    m = 128
    # half real keys, half misses
    pick = rng.integers(0, can.shape[0], size=D * m // 2)
    real = can[pick]
    fake = rng.integers(0, 2 ** 16, size=(D * m - real.shape[0], w)
                        ).astype(np.uint32)
    fake[:, 0] |= 1 << 29  # beyond canonical top-word range: never hits
    queries = np.concatenate([real, fake]).reshape(D, m, w)
    deleted = np.zeros((D, cap), np.int32)
    router = sharded_graph.Router(mesh, cap)
    got = np.asarray(router.lookup(
        jnp.asarray(keys), jnp.asarray(n), jnp.asarray(deleted),
        jnp.asarray(queries), k=K))
    want = np.concatenate(
        [gid[pick], np.full(fake.shape[0], -1, np.int32)]
    ).reshape(D, m)
    np.testing.assert_array_equal(got, want)


def test_routed_lookup_respects_deleted(mesh, rng):
    can, keys, n, gid, cap = _random_sharded_table(rng, 200)
    deleted = np.zeros((D, cap), np.int32)
    # delete every 3rd key globally
    dead = set()
    for i in range(0, can.shape[0], 3):
        g = gid[i]
        deleted[g // cap, g % cap] = 1
        dead.add(i)
    m = 64
    pick = rng.integers(0, can.shape[0], size=D * m)
    queries = can[pick].reshape(D, m, -1)
    router = sharded_graph.Router(mesh, cap)
    got = np.asarray(router.lookup(
        jnp.asarray(keys), jnp.asarray(n), jnp.asarray(deleted),
        jnp.asarray(queries), k=K))
    want = np.where(np.isin(pick, list(dead)), -1, gid[pick]
                    ).reshape(D, m)
    np.testing.assert_array_equal(got, want)


def test_sharded_list_rank_matches_dense(mesh, rng):
    """Random chain forest + a couple of cycles: head/rank/is_head
    must agree with ops/ranking.list_rank."""
    cap = 64
    n = D * cap
    prev = np.full(n, -1, np.int32)
    exists = np.zeros(n, bool)
    perm = rng.permutation(n)
    pos = 0
    # 40 chains of random lengths
    for _ in range(40):
        ln = int(rng.integers(1, 12))
        chain = perm[pos:pos + ln]
        if len(chain) < 1:
            break
        pos += ln
        exists[chain] = True
        for a, b in zip(chain[:-1], chain[1:]):
            prev[b] = a
    # two cycles
    for _ in range(2):
        ln = int(rng.integers(3, 8))
        cyc = perm[pos:pos + ln]
        pos += ln
        exists[cyc] = True
        for a, b in zip(cyc, np.roll(cyc, -1)):
            prev[b] = a

    head_d, rank_d, ishead_d = ranking.list_rank(
        jnp.asarray(prev), jnp.asarray(exists))
    router = sharded_graph.Router(mesh, cap)
    head_s, rank_s, ishead_s = sharded_graph.sharded_list_rank(
        router, jnp.asarray(prev.reshape(D, cap)),
        jnp.asarray(exists.reshape(D, cap)))
    np.testing.assert_array_equal(
        np.asarray(head_s).reshape(-1)[exists],
        np.asarray(head_d)[exists])
    np.testing.assert_array_equal(
        np.asarray(rank_s).reshape(-1)[exists],
        np.asarray(rank_d)[exists])
    np.testing.assert_array_equal(
        np.asarray(ishead_s).reshape(-1), np.asarray(ishead_d))
