"""Reference-format graph stage files: .vertex / .edge.gz / .preArc
(pregraph -> contig boundary) and .updated.edge / .Arc /
.newContigIndex (contig -> scaff boundary).

Writers let the reference binary resume from our stage output; loaders
let us resume from the reference's — the oracle-diff interop SURVEY.md
§4/§5 calls for.  Formats:

* .vertex  — branch-kmer hex dump, 8 per line (reference
  output_pregraph.c:47-81, print_kmer kmer.c:499-516); the loader
  canonicalizes and sorts (loadPreGraph.c:52-122).
* .edge.gz — one record per canonical edge pair:
  ``>length L,<from kmer hex>,<to kmer hex>,cvg C, B`` + seq chars
  (100/line); the loader materializes the reverse-complement twin
  right after each B==1 record (output_pregraph.c:83-100,
  loadPreGraph.c:306-541).
* .preArc  — ``from to1 m1 to2 m2 ...`` with 1-based edge ids
  (prlRead2path.c output_arcs, loadPreGraph.c:629-670).
* .updated.edge — ``EDGEs n`` + per contig
  ``>length L,S,C <from hex>,<to hex>,`` where S is 1/-1/0 for
  smaller-than-twin / larger / palindrome and L includes the K overlap
  (output_contig.c:289-336; scaff parses only L,S,C —
  loadGraph.c:207-330).
* .Arc — ``i to1 m1 ...`` in contig ids, wrapped every 10 pairs
  (output_contig.c:336-380).
* .newContigIndex — ``old new bal_edge`` emitted while the scaff
  stage re-sorts contigs by length (loadGraph.c:241-331).

Hex formatting follows the compile-time MER variant the reference
would use for this K: one u64 for K<=31, "high low" for K<=63, four
u64 words for K<=127 (kmer.c print_kmer / loadPreGraph fscanf).
"""

from __future__ import annotations

import gzip
from typing import List, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops import bits

_COMP = {"A": "T", "C": "G", "T": "A", "G": "C"}


import functools

import jax


@functools.partial(jax.jit, static_argnums=(1,))
def _canon_rows_jit(rows, k):
    return bits.canonical(rows, k)


def _canon_rows(rows_np: np.ndarray, k: int):
    """Batched canonicalization with shape padding (power-of-two row
    counts) so resuming many different file sizes reuses a handful of
    compiled shapes."""
    n = rows_np.shape[0]
    cap = 1 << max((n - 1).bit_length(), 10)
    pad = np.zeros((cap - n, rows_np.shape[1]), np.uint32)
    can, use_rc = _canon_rows_jit(
        jnp.asarray(np.concatenate([rows_np, pad])), k)
    return np.asarray(can[:n]), np.asarray(use_rc[:n])


def _row_keys(a: np.ndarray) -> np.ndarray:
    """(n, w) uint32 rows -> (n,) void keys that compare
    lexicographically (big-endian byte view) for sort/searchsorted."""
    if a.shape[0] == 0:
        return np.zeros(0, dtype=np.dtype((np.void, max(a.shape[1], 1) * 4)))
    be = np.ascontiguousarray(a.astype(">u4"))
    return be.view(np.dtype((np.void, a.shape[1] * 4))).reshape(-1)


def _n_u64(k: int) -> int:
    return 1 if k <= 31 else (2 if k <= 63 else 4)


def _lanes_to_int(lanes: np.ndarray) -> int:
    v = 0
    for x in lanes:
        v = (v << 32) | int(x)
    return v


def _int_to_lanes(v: int, w: int) -> np.ndarray:
    return np.asarray(
        [(v >> (32 * (w - 1 - i))) & 0xFFFFFFFF for i in range(w)],
        dtype=np.uint32)


def _kmer_hex(lanes: np.ndarray, k: int) -> str:
    """print_kmer text for one kmer (kmer.c:499-516)."""
    v = _lanes_to_int(lanes)
    n = _n_u64(k)
    if n == 1:
        return f"{v:x}" if v else "0x0"  # MER31 zero quirk
    words = [(v >> (64 * (n - 1 - i))) & ((1 << 64) - 1) for i in range(n)]
    return " ".join(f"{wv:x}" for wv in words)


def _parse_kmer_hex(words: List[str], k: int) -> np.ndarray:
    v = 0
    for t in words:
        v = (v << 64) | int(t, 16)
    return _int_to_lanes(v, bits.words_for_k(k))


def _revcomp_int(v: int, k: int) -> int:
    out = 0
    for _ in range(k):
        out = (out << 2) | ((v & 3) ^ 2)
        v >>= 2
    return out


def _oriented_kmer(table_keys: np.ndarray, node: int, k: int) -> int:
    """Directed node id (2*row + s) -> oriented kmer integer."""
    row, s = node >> 1, node & 1
    v = _lanes_to_int(table_keys[row])
    return _revcomp_int(v, k) if s else v


# ---------------------------------------------------------------------------
# pregraph -> contig boundary
# ---------------------------------------------------------------------------

def edge_file_ids(edges):
    """Edge row -> 1-based .edge.gz file id (rep first, twin = id+1 —
    the reference loader's bal_edge convention, loadPreGraph.c:543).
    Returns (file_id (n_e,) int64, rep rows in file order, next id)."""
    n_e = int(edges.n_edges)
    twin = np.asarray(edges.twin[:n_e])
    file_id = np.zeros(n_e, np.int64)
    nxt = 1
    order: List[int] = []
    for e in range(n_e):
        t = int(twin[e])
        if t == e:
            file_id[e] = nxt
            order.append(e)
            nxt += 1
        elif file_id[e] == 0:
            file_id[e] = nxt
            if 0 <= t < n_e:
                file_id[t] = nxt + 1
            order.append(e)
            nxt += 2
    return file_id, order, nxt


def write_pregraph_files(prefix: str, table, edges, arcs, k: int) -> int:
    """Write .vertex, .edge.gz and .preArc from the in-memory pregraph
    result; returns the vertex count (for .preGraphBasic's VERTEX
    field).  Edge file ids are assigned pairwise (rep then twin) like
    the reference loader expects."""
    keys = np.asarray(table.keys)
    n_e = int(edges.n_edges)
    from_node = np.asarray(edges.from_node[:n_e])
    to_node = np.asarray(edges.to_node[:n_e])
    length = np.asarray(edges.length[:n_e])
    cvg = np.asarray(edges.cvg[:n_e])
    twin = np.asarray(edges.twin[:n_e])
    seq_off = np.asarray(edges.seq_off[:n_e])
    pool = np.asarray(edges.seq_pool)

    # vertex set: canonical rows of all live edge endpoints
    rows = np.unique(np.concatenate([from_node, to_node]) >> 1)
    with open(prefix + ".vertex", "w") as fh:
        for i, r in enumerate(rows):
            fh.write(_kmer_hex(keys[r], k) + " ")
            if (i + 1) % 8 == 0:
                fh.write("\n")
        fh.write("\n")

    # edges: rep first, twin implicit
    file_id, order, nxt = edge_file_ids(edges)
    with gzip.open(prefix + ".edge.gz", "wt") as fh:
        for e in order:
            fk = _kmer_hex(
                _int_to_lanes(
                    _oriented_kmer(keys, int(from_node[e]), k),
                    bits.words_for_k(k)), k)
            tk = _kmer_hex(
                _int_to_lanes(
                    _oriented_kmer(keys, int(to_node[e]), k),
                    bits.words_for_k(k)), k)
            bal = 0 if int(twin[e]) == e else 1
            ln = int(length[e])
            fh.write(f">length {ln},{fk},{tk},cvg {int(cvg[e])}, {bal}\n")
            s = pool[int(seq_off[e]): int(seq_off[e]) + ln]
            line = "".join(bits.BASE_CHARS[b] for b in s)
            for j in range(0, max(ln, 1), 100):
                fh.write(line[j: j + 100] + "\n")

    a_n = int(arcs.n)
    f = np.asarray(arcs.from_ed[:a_n])
    t = np.asarray(arcs.to_ed[:a_n])
    m = np.asarray(arcs.mult[:a_n])
    by_from: dict = {}
    for i in range(a_n):
        by_from.setdefault(int(file_id[f[i]]), []).append(
            (int(file_id[t[i]]), int(m[i])))
    with open(prefix + ".preArc", "w") as fh:
        for fe in sorted(by_from):
            parts = [str(fe)]
            for te, mm in by_from[fe]:
                parts.append(f"{te} {mm}")
            fh.write(" ".join(parts) + "\n")
    return len(rows)


def load_pregraph_files(prefix: str):
    """Parse reference .preGraphBasic/.vertex/.edge.gz/.preArc into
    (vertex KmerTable, EdgeGraph, ArcSet, k) in our representation
    (explicit twin rows, like loadPreGraph.c's loadVertex/loadEdge/
    loadPreArcs)."""
    import jax.numpy as jnp

    from ..graph import arcs as arcs_mod
    from ..graph import unitigs
    from ..ops import dictionary

    k = None
    n_vt = n_ed = 0
    with open(prefix + ".preGraphBasic") as fh:
        for line in fh:
            if line.startswith("VERTEX"):
                parts = line.split()
                n_vt, k = int(parts[1]), int(parts[3])
            elif line.startswith("EDGEs"):
                n_ed = int(line.split()[1])
    assert k, ".preGraphBasic missing VERTEX line"
    w = bits.words_for_k(k)
    nu = _n_u64(k)

    toks: List[str] = []
    with open(prefix + ".vertex") as fh:
        for line in fh:
            toks.extend(line.split())
    raw_vt = np.zeros((n_vt, w), np.uint32)
    for i in range(n_vt):
        raw_vt[i] = _parse_kmer_hex(toks[i * nu: (i + 1) * nu], k)
    if n_vt:
        can_vt = _canon_rows(raw_vt, k)[0]
        vt_keys = can_vt[np.argsort(_row_keys(can_vt), kind="stable")]
        vt_keys = np.unique(vt_keys, axis=0)  # defensive (twins listed)
    else:
        vt_keys = np.zeros((0, w), np.uint32)
    vt_void = _row_keys(vt_keys)

    # edges: (len, fk lanes, tk lanes, cvg, seq, bal)
    lens_l: List[int] = []
    cvg_l: List[int] = []
    bal_l: List[int] = []
    seqs_l: List[str] = []
    fk_rows: List[np.ndarray] = []
    tk_rows: List[np.ndarray] = []
    with gzip.open(prefix + ".edge.gz", "rt") as fh:
        seq_parts: List[str] = []
        pending = False
        for line in fh:
            line = line.strip()
            if line.startswith(">"):
                if pending:
                    seqs_l.append("".join(seq_parts))
                    seq_parts = []
                body = line[len(">length "):]
                fields = body.split(",")
                lens_l.append(int(fields[0]))
                fk_rows.append(_parse_kmer_hex(fields[1].split(), k))
                tk_rows.append(_parse_kmer_hex(fields[2].split(), k))
                cvg_l.append(int(fields[3].split()[1]))
                bal_l.append(int(fields[4].strip()))
                pending = True
            elif pending:
                seq_parts.append(
                    "".join(c for c in line if c.isalpha()))
        if pending:
            seqs_l.append("".join(seq_parts))

    n_r = len(lens_l)
    if n_r:
        fk = np.stack(fk_rows)
        tk = np.stack(tk_rows)
        bal = np.asarray(bal_l, np.int64)
        # batched canonicalization + vertex lookup (one searchsorted
        # over lexicographic row keys instead of a bisect per endpoint)
        def vt_ids(raw):
            can, use_rc = _canon_rows(raw, k)
            idx = np.searchsorted(vt_void, _row_keys(can))
            idx = np.clip(idx, 0, max(vt_keys.shape[0] - 1, 0))
            assert vt_keys.shape[0] and \
                (vt_keys[idx] == can).all(), "vertex not found"
            return 2 * idx + use_rc.astype(np.int64)

        fk_id = vt_ids(fk)
        tk_id = vt_ids(tk)
        # twin record ids: vt_id(revcomp(x)) shares x's canonical row
        # with flipped orientation (odd K has no palindromic kmers)
        rc_tk_id = tk_id ^ 1
        rc_fk_id = fk_id ^ 1

        # interleave rep/twin rows: record r occupies slots
        # [slot[r], slot[r] + 1 + bal[r])
        per = 1 + bal
        slot = np.concatenate([[0], np.cumsum(per)[:-1]])
        n_e = int(per.sum())
        from_node = np.zeros(n_e, np.int64)
        to_node = np.zeros(n_e, np.int64)
        length = np.zeros(n_e, np.int64)
        cvg_arr = np.zeros(n_e, np.int64)
        twin_arr = np.zeros(n_e, np.int64)
        from_node[slot] = fk_id
        to_node[slot] = tk_id
        length[slot] = np.asarray(lens_l)
        cvg_arr[slot] = np.asarray(cvg_l)
        twin_arr[slot] = np.where(bal == 1, slot + 1, slot)
        tw = slot[bal == 1] + 1
        from_node[tw] = rc_tk_id[bal == 1]
        to_node[tw] = rc_fk_id[bal == 1]
        length[tw] = np.asarray(lens_l)[bal == 1]
        cvg_arr[tw] = np.asarray(cvg_l)[bal == 1]
        twin_arr[tw] = slot[bal == 1]

        # sequence pool: rep seqs from text; twin seq = revcomp of
        # (K-prefix + seq) minus its K-prefix, all in code space
        seq_off = np.zeros(n_e, np.int64)
        pool_chunks: List[np.ndarray] = []
        off = 0
        for r in range(n_r):
            codes = bits._CHAR2CODE[np.frombuffer(
                seqs_l[r].encode(), np.uint8)]
            seq_off[slot[r]] = off
            pool_chunks.append(codes)
            off += codes.shape[0]
            if bal[r] == 1:
                km = np.asarray(
                    [(int(_lanes_to_int(fk[r])) >> (2 * (k - 1 - j))) & 3
                     for j in range(k)], np.uint8)
                full = np.concatenate([km, codes])
                # revcomp of the full edge, minus ITS k-prefix
                rc = (full[::-1] ^ 2).astype(np.uint8)[k:]
                seq_off[slot[r] + 1] = off
                pool_chunks.append(rc)
                off += rc.shape[0]
        pool_codes_all = np.concatenate(pool_chunks) if pool_chunks \
            else np.zeros(0, np.uint8)
    else:
        n_e = 0
        from_node = to_node = length = cvg_arr = twin_arr = \
            np.zeros(0, np.int64)
        seq_off = np.zeros(0, np.int64)
        pool_codes_all = np.zeros(0, np.uint8)

    cvg = cvg_arr
    twin = twin_arr
    e_cap = dictionary.round_up(max(n_e, 1))
    s_cap = dictionary.round_up(max(int(pool_codes_all.shape[0]), 1))
    pool_arr = np.zeros(s_cap, np.uint8)
    pool_arr[: pool_codes_all.shape[0]] = pool_codes_all
    seq_off = np.concatenate(
        [seq_off, np.zeros(e_cap - n_e, np.int64)]).astype(np.int32)

    def pad(a, fill, dtype=np.int32):
        out = np.full(e_cap, fill, dtype)
        out[:n_e] = a
        return out

    edges = unitigs.EdgeGraph(
        jnp.asarray(pad(from_node, -1)), jnp.asarray(pad(to_node, -1)),
        jnp.asarray(pad(length, 0)), jnp.asarray(pad(cvg, 0)),
        jnp.asarray(pad(twin, -1)), jnp.asarray(seq_off),
        jnp.asarray(pool_arr), jnp.int32(n_e),
        jnp.full(2 * max(vt_keys.shape[0], 1), -1, np.int32),
        jnp.full(2 * max(vt_keys.shape[0], 1), -1, np.int32),
        jnp.zeros(e_cap, bool))

    cap_v = dictionary.round_up(max(vt_keys.shape[0], 1))
    keys = np.full((cap_v, w), 0xFFFFFFFF, np.uint32)
    if vt_keys.shape[0]:
        keys[: vt_keys.shape[0]] = vt_keys
    table = dictionary.KmerTable(
        jnp.asarray(keys), jnp.zeros(cap_v, jnp.int32),
        jnp.zeros((cap_v, 4), jnp.int32), jnp.zeros((cap_v, 4), jnp.int32),
        jnp.int32(vt_keys.shape[0]), jnp.zeros(cap_v, bool))

    fr, to, mu = [], [], []
    try:
        fh = open(prefix + ".preArc")
    except FileNotFoundError:
        fh = None
    if fh is not None:
        with fh:
            for line in fh:
                parts = line.split()
                if len(parts) < 3:
                    continue
                fe = int(parts[0]) - 1
                for i in range(1, len(parts) - 1, 2):
                    fr.append(fe)
                    to.append(int(parts[i]) - 1)
                    mu.append(int(parts[i + 1]))
    a_cap = dictionary.round_up(max(len(fr), 1))

    def pad_a(a):
        out = np.zeros(a_cap, np.int32)
        out[: len(a)] = a
        return jnp.asarray(out)

    aset = arcs_mod.ArcSet(pad_a(fr), pad_a(to), pad_a(mu),
                           jnp.int32(len(fr)))
    return table, edges, aset, k


# ---------------------------------------------------------------------------
# contig -> scaff boundary
# ---------------------------------------------------------------------------

def write_contig_graph_files(prefix: str, ctg, table, k: int,
                             perm: List[int]) -> None:
    """.updated.edge + .Arc in the .contig/.ContigIndex numbering
    (perm: new id - 1 -> contig row, from write_contig_fasta)."""
    keys = np.asarray(table.keys)
    n = int(ctg.n)
    length = np.asarray(ctg.length[:n])
    cvg = np.asarray(ctg.cvg[:n])
    twin = np.asarray(ctg.twin[:n])
    from_node = np.asarray(ctg.from_node[:n])
    to_node = np.asarray(ctg.to_node[:n])
    new_of = np.zeros(n, np.int64)
    for i, row in enumerate(perm):
        new_of[row] = i + 1

    with open(prefix + ".updated.edge", "w") as fh:
        fh.write(f"EDGEs {len(perm)}\n")
        for row in perm:
            t = int(twin[row])
            if t == row:
                s = 0
            else:
                s = 1 if new_of[row] < new_of[t] else -1
            ln = int(length[row])
            full = ln + k if ln else 0
            fk = _kmer_hex(_int_to_lanes(
                _oriented_kmer(keys, int(from_node[row]), k),
                bits.words_for_k(k)), k)
            tk = _kmer_hex(_int_to_lanes(
                _oriented_kmer(keys, int(to_node[row]), k),
                bits.words_for_k(k)), k)
            fh.write(f">length {full},{s},{int(cvg[row])} {fk},{tk},\n")

    arcs = ctg.arcs
    a_n = int(arcs.n)
    f = np.asarray(arcs.from_ed[:a_n])
    t = np.asarray(arcs.to_ed[:a_n])
    m = np.asarray(arcs.mult[:a_n])
    by_from: dict = {}
    for i in range(a_n):
        if f[i] < 0 or f[i] >= n or t[i] < 0 or t[i] >= n:
            continue
        by_from.setdefault(int(new_of[f[i]]), []).append(
            (int(new_of[t[i]]), int(m[i])))
    with open(prefix + ".Arc", "w") as fh:
        for fe in sorted(by_from):
            fh.write(str(fe))
            for j, (te, mm) in enumerate(by_from[fe]):
                fh.write(f" {te} {mm}")
                if (j + 1) % 10 == 0:
                    fh.write(f"\n{fe}")
            fh.write("\n")


def load_contig_graph_files(prefix: str):
    """Parse reference .preGraphBasic/.updated.edge/.Arc/.contig into
    (Contigs, k); row order = .updated.edge record order (0-based
    file id - 1), i.e. the .ContigIndex numbering our map stage uses.
    Also writes .newContigIndex like the reference scaff loader
    (loadGraph.c:241-331)."""
    import jax.numpy as jnp

    from ..graph import arcs as arcs_mod
    from ..graph import contig_merge
    from ..ops import dictionary

    k = None
    with open(prefix + ".preGraphBasic") as fh:
        for line in fh:
            if line.startswith("VERTEX"):
                k = int(line.split()[3])
                break
    assert k, ".preGraphBasic missing VERTEX line"

    lengths, bals, cvgs = [], [], []
    with open(prefix + ".updated.edge") as fh:
        for line in fh:
            if line.startswith(">"):
                body = line[len(">length "):]
                f0, f1, rest = body.split(",", 2)
                lengths.append(int(f0))
                bals.append(int(f1))
                cvgs.append(int(rest.split()[0]))
    n = len(lengths)
    length = np.asarray(lengths, np.int64)
    app_len = np.maximum(length - k, 0)  # appended bases

    twin = np.arange(n, dtype=np.int64)
    for i in range(n):
        if bals[i] == 1:
            twin[i] = i + 1
        elif bals[i] == -1:
            twin[i] = i - 1

    # .newContigIndex: re-sort by full length asc, old index asc
    order = np.argsort(length, kind="stable")
    new_of = np.zeros(n, np.int64)
    for newi, old in enumerate(order):
        new_of[old] = newi + 1
    with open(prefix + ".newContigIndex", "w") as fh:
        for old in range(n):
            bal_edge = bals[old] + 1
            fh.write(f"{old + 1} {new_of[old]} {bal_edge}\n")

    # contig sequences (only reps are printed in .contig)
    seqs = [""] * n
    cur_id = None
    try:
        with open(prefix + ".contig") as fh:
            buf: List[str] = []
            for line in fh:
                if line.startswith(">"):
                    if cur_id is not None:
                        seqs[cur_id] = "".join(buf)
                    cur_id = int(line.split()[0][1:]) - 1
                    buf = []
                else:
                    buf.append(line.strip())
            if cur_id is not None:
                seqs[cur_id] = "".join(buf)
    except FileNotFoundError:
        pass
    for i in range(n):
        if not seqs[i] and 0 <= twin[i] < n and seqs[int(twin[i])]:
            seqs[i] = "".join(
                _COMP[c] for c in reversed(seqs[int(twin[i])]))

    c_cap = dictionary.round_up(max(n, 1))
    pool_parts, seq_off = [], np.zeros(c_cap, np.int32)
    off = 0
    for i in range(n):
        seq_off[i] = off
        tail = seqs[i][k:] if len(seqs[i]) >= k else ""
        pool_parts.append(tail)
        off += len(tail)
    pool = "".join(pool_parts)
    s_cap = dictionary.round_up(max(len(pool), 1))
    pool_arr = np.zeros(s_cap, np.uint8)
    if pool:
        pool_arr[: len(pool)] = bits._CHAR2CODE[
            np.frombuffer(pool.encode(), np.uint8)]

    # the K-base prefix of each contig comes from its own mini "table":
    # store each contig's first kmer as a table row (canonical) and set
    # from_node to reference it with the right orientation.
    w = bits.words_for_k(k)
    keys = np.full((c_cap, w), 0xFFFFFFFF, np.uint32)
    from_node = np.full(c_cap, -1, np.int32)
    code = {"A": 0, "C": 1, "T": 2, "G": 3}
    for i in range(n):
        s = seqs[i]
        if len(s) < k:
            continue
        v = 0
        for ch in s[:k]:
            v = (v << 2) | code.get(ch, 0)
        rc = _revcomp_int(v, k)
        can = min(v, rc)
        keys[i] = _int_to_lanes(can, w)
        from_node[i] = 2 * i + (0 if v == can else 1)

    table = dictionary.KmerTable(
        jnp.asarray(keys), jnp.zeros(c_cap, jnp.int32),
        jnp.zeros((c_cap, 4), jnp.int32), jnp.zeros((c_cap, 4), jnp.int32),
        jnp.int32(n), jnp.zeros(c_cap, bool))

    fr, to, mu = [], [], []
    try:
        fh = open(prefix + ".Arc")
    except FileNotFoundError:
        fh = None
    if fh is not None:
        with fh:
            for line in fh:
                parts = line.split()
                if len(parts) < 3:
                    continue
                fe = int(parts[0]) - 1
                for i in range(1, len(parts) - 1, 2):
                    fr.append(fe)
                    to.append(int(parts[i]) - 1)
                    mu.append(int(parts[i + 1]))
    a_cap = dictionary.round_up(max(len(fr), 1))

    def pad_a(a):
        out = np.zeros(a_cap, np.int32)
        out[: len(a)] = a
        return jnp.asarray(out)

    aset = arcs_mod.ArcSet(pad_a(fr), pad_a(to), pad_a(mu),
                           jnp.int32(len(fr)))

    def pad(a, fill, dtype=np.int32):
        out = np.full(c_cap, fill, dtype)
        out[:n] = a
        return jnp.asarray(out)

    ctg = contig_merge.Contigs(
        jnp.asarray(from_node), pad(np.full(n, -1), -1),
        pad(app_len, 0), pad(cvgs, 0), pad(twin, -1),
        jnp.asarray(seq_off), jnp.asarray(pool_arr), jnp.int32(n),
        jnp.full(1, -1, np.int32), aset)
    return ctg, table, k
