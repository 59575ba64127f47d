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

    # two isoforms sharing flanks: branch vertices + edge-crossing
    # reads make the preArc comparison meaningful
    a = "".join(rng.choice(list("ACGT"), size=120))
    b = "".join(rng.choice(list("ACGT"), size=120))
    c1 = "".join(rng.choice(list("ACGT"), size=40))
    c2 = "".join(rng.choice(list("ACGT"), size=40))
    reads = []
    for t in (a + c1 + b, a + c2 + b):
        for i in range(0, len(t) - 50 + 1, 4):
            reads.append(t[i : i + 50])
    codes = np.full((128, 50), 4, np.uint8)
    lens = np.zeros(128, np.int32)
    from soapdenovo_trans_tpu.ops import bits
    for i, s in enumerate(reads[:128]):
        codes[i, : len(s)] = bits.encode_seq(s)
        lens[i] = len(s)

    def factory():
        return iter([(codes, lens, 0)])

    single = pg.run_pregraph(factory, K, clip_tips=False)

    from soapdenovo_trans_tpu.graph import unitigs

    def edge_set(res):
        return sorted(unitigs.edge_sequences(res.edges, res.table, K))

    want = edge_set(single)
    # identical edge sets at D=1, 2, 8 (VERDICT r2 item 2's invariance
    # criterion); the sharded path returns only the mini endpoint
    # table — the full table stays mesh-resident
    assert int(single.arcs.n) > 0  # branch graph: arcs must exist
    for d in (2, 8):
        mesh = Mesh(np.array(jax.devices()[:d]), (sharded_count.AXIS,))
        sharded = pg.run_pregraph(factory, K, clip_tips=False,
                                  mesh=mesh)
        assert sharded.graph is None  # no dense DBG materialized
        assert sharded.n_distinct == single.n_distinct
        assert edge_set(sharded) == want, f"D={d}"
        assert int(sharded.arcs.n) == int(single.arcs.n), f"D={d}"
        assert sharded.freq_hist is not None
        hist = pg.kmer_freq_histogram(single.table)
        assert np.array_equal(sharded.freq_hist, hist), f"D={d}"


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_cli_pipeline_on_sharded_pregraph(rng, tmp_path, monkeypatch):
    """Full CLI `all` with the mesh-resident pregraph enabled: same
    contig set as the dense path on the same reads."""
    import os

    from soapdenovo_trans_tpu import cli
    from soapdenovo_trans_tpu.io import fastx
    from soapdenovo_trans_tpu.ops import bits
    from tests.test_e2e import unique_kmer_seq, read_contig_fasta

    t = unique_kmer_seq(rng, 300, 21)
    reads = []
    for i in range(0, len(t) - 50 + 1, 3):
        r = t[i : i + 50]
        reads.append(bits.revcomp_str(r) if rng.random() < 0.5 else r)
    fa = os.path.join(str(tmp_path), "reads.fa")
    fastx.write_fasta(fa, [(f"r{i}", s) for i, s in enumerate(reads)])
    cfg = os.path.join(str(tmp_path), "lib.config")
    with open(cfg, "w") as fh:
        fh.write(f"max_rd_len=50\n[LIB]\nasm_flags=3\nf={fa}\n")

    out_dense = os.path.join(str(tmp_path), "dense")
    cli.main(["all", "-s", cfg, "-o", out_dense, "-K", "21"])

    monkeypatch.delenv("SOAPDENOVO_TPU_NO_SHARD", raising=False)
    out_shard = os.path.join(str(tmp_path), "shard")
    cli.main(["all", "-s", cfg, "-o", out_shard, "-K", "21"])

    def canon_set(path):
        return {min(s, bits.revcomp_str(s))
                for s in read_contig_fasta(path)}

    assert canon_set(out_shard + ".contig") == \
        canon_set(out_dense + ".contig")
    assert canon_set(out_shard + ".scafSeq") == \
        canon_set(out_dense + ".scafSeq")

    # .readOnContig shard-count invariance: contig ids (and strand
    # representatives) may permute between runs, so resolve each id
    # through the .contig headers (twin ids are consecutive,
    # unprinted) to its canonical sequence.  Exact pos/orient
    # equality is covered at array level by
    # test_map.test_sharded_map_matches_dense.
    def read_on_contig(prefix):
        id2seq = {}
        with open(prefix + ".contig") as fh:
            cid, cur = None, []
            for line in fh:
                if line.startswith(">"):
                    if cid is not None:
                        id2seq[cid] = "".join(cur)
                    cid, cur = int(line[1:].split()[0]), []
                else:
                    cur.append(line.strip())
            if cid is not None:
                id2seq[cid] = "".join(cur)

        def canon_of(c):
            s = id2seq.get(c) or id2seq.get(c - 1) or id2seq.get(c + 1)
            return min(s, bits.revcomp_str(s))

        rows = set()
        with open(prefix + ".readOnContig") as fh:
            next(fh)  # header
            for line in fh:
                rd, c, _pos, _orien = line.split()
                rows.add((int(rd), canon_of(int(c))))
        return rows

    assert read_on_contig(out_shard) == read_on_contig(out_dense)
