"""Sharded counting over an 8-device virtual mesh must reproduce the
single-device dictionary exactly (shard-count invariance — the key
multi-chip property per SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from soapdenovo_trans_tpu.ops import bits, dictionary, kmer
from soapdenovo_trans_tpu.parallel import sharded_count

K = 23


def make_reads(rng, n_reads, read_len):
    seqs = rng.integers(0, 4, size=(n_reads, read_len)).astype(np.uint8)
    lens = rng.integers(K, read_len + 1, size=n_reads).astype(np.int32)
    # some Ns sprinkled in
    mask = rng.random((n_reads, read_len)) < 0.01
    seqs[mask] = 4
    return seqs, lens


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_matches_single(rng):
    d = 8
    batch = 16
    read_len = 60
    mesh = Mesh(np.array(jax.devices()[:d]), (sharded_count.AXIS,))
    seqs, lens = make_reads(rng, d * batch, read_len)

    run = sharded_count.make_sharded_counter(mesh, K, batch, read_len)
    sharding = NamedSharding(mesh, P(sharded_count.AXIS, None))
    st = run(jax.device_put(jnp.asarray(seqs), sharding),
             jax.device_put(jnp.asarray(lens),
                            NamedSharding(mesh, P(sharded_count.AXIS))))
    assert int(jnp.sum(st.dropped)) == 0
    fin = sharded_count.make_sharded_finalizer(mesh, K)
    merged = sharded_count.gather_to_table(fin(st))

    stream = kmer.chop_reads(jnp.asarray(seqs), jnp.asarray(lens), K)
    ref = dictionary.build(stream, K)

    n = int(ref.n)
    assert int(merged.n) == n
    assert np.array_equal(np.asarray(merged.keys[:n]),
                          np.asarray(ref.keys[:n]))
    assert np.array_equal(np.asarray(merged.count[:n]),
                          np.asarray(ref.count[:n]))
    assert np.array_equal(np.asarray(merged.l_cov[:n]),
                          np.asarray(ref.l_cov[:n]))
    assert np.array_equal(np.asarray(merged.r_cov[:n]),
                          np.asarray(ref.r_cov[:n]))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_shard_count_invariance(rng):
    """Same data, different shard counts -> same global table."""
    read_len = 50
    seqs, lens = make_reads(rng, 32, read_len)
    tables = []
    for d in (2, 4):
        mesh = Mesh(np.array(jax.devices()[:d]), (sharded_count.AXIS,))
        run = sharded_count.make_sharded_counter(mesh, K, 32 // d, read_len)
        sharding = NamedSharding(mesh, P(sharded_count.AXIS, None))
        st = run(jax.device_put(jnp.asarray(seqs), sharding),
                 jax.device_put(jnp.asarray(lens),
                                NamedSharding(mesh, P(sharded_count.AXIS))))
        fin = sharded_count.make_sharded_finalizer(mesh, K)
        tables.append(sharded_count.gather_to_table(fin(st)))
    a, b = tables
    n = int(a.n)
    assert int(b.n) == n
    assert np.array_equal(np.asarray(a.keys[:n]), np.asarray(b.keys[:n]))
    assert np.array_equal(np.asarray(a.count[:n]), np.asarray(b.count[:n]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_pregraph_end_to_end(rng):
    """run_pregraph with a mesh must produce the same edges/arcs as
    the single-device path."""
    from soapdenovo_trans_tpu.graph import unitigs
    from soapdenovo_trans_tpu.stages import pregraph as pg

    reads = []
    t = "".join(rng.choice(list("ACGT"), size=300))
    for i in range(0, 251, 5):
        reads.append(t[i : i + 50])
    codes = np.full((64, 50), 4, np.uint8)
    lens = np.zeros(64, np.int32)
    from soapdenovo_trans_tpu.ops import bits
    for i, s in enumerate(reads):
        codes[i, : len(s)] = bits.encode_seq(s)
        lens[i] = len(s)

    def factory():
        return iter([(codes, lens, 0)])

    single = pg.run_pregraph(factory, K, clip_tips=False)
    mesh = Mesh(np.array(jax.devices()[:8]), (sharded_count.AXIS,))
    sharded = pg.run_pregraph(factory, K, clip_tips=False, mesh=mesh)
    n = int(single.table.n)
    assert int(sharded.table.n) == n
    assert np.array_equal(np.asarray(single.table.keys[:n]),
                          np.asarray(sharded.table.keys[:n]))
    assert int(single.edges.n_edges) == int(sharded.edges.n_edges)
    assert int(single.arcs.n) == int(sharded.arcs.n)
