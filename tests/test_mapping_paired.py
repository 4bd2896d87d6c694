"""Read mapping, insert-size estimation, and paired-info tests.

Mirrors the mapping/paired-info behavior exercised by the reference's
PairInfoCount stage (projects/spades/pair_info_count.cpp) and
graph_alignment_test.cpp / paired_info_test.cpp.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import naive_debruijn as nd
from spades_for_blackbird_tpu.graph import construct
from spades_for_blackbird_tpu.mapping import index as eidx
from spades_for_blackbird_tpu.mapping import mapper
from spades_for_blackbird_tpu.ops import dna
from spades_for_blackbird_tpu.paired import insert_size, pair_info

K = 15


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def build(seqs, k=K):
    codes, lengths = dna.encode_reads(seqs)
    return construct.graph_from_reads(codes, lengths, k)


def test_edge_index_and_exact_mapping():
    genome = random_dna(300, 1)
    g = build([genome])
    idx = eidx.build_edge_index(g, K)
    # index holds every canonical kmer of both strands' edges;
    # fwd and rc edges contribute the same canonical set
    assert int(idx.num) == 2 * (300 - K + 1)

    # map reads drawn from the genome (both strands)
    reads = [genome[i:i + 50] for i in range(0, 250, 25)]
    reads += [nd.rc(r) for r in reads[:3]]
    codes, lengths = dna.encode_reads(reads)
    m = mapper.map_reads(idx, g.seq_len, codes, lengths, K)
    assert bool(np.asarray(m.mapped).all())

    # identify which edge is the forward-genome edge
    from spades_for_blackbird_tpu.io.fasta import graph_contigs
    flat = np.asarray(g.seq_flat)
    fwd_edge = None
    for e in range(int(g.num_edges)):
        s, ln = int(g.seq_start[e]), int(g.seq_len[e])
        if dna.decode_codes(flat[s:s + ln]) == genome:
            fwd_edge = e
    assert fwd_edge is not None

    oe = np.asarray(m.oriented_edge)
    st = np.asarray(m.start)
    for i in range(10):
        expect_start = (i * 25) if i < len(reads) - 3 else (i - 10) * 25
        # reads 0..9 forward; the (rc) reads map to the conjugate edge in
        # its own orientation OR to fwd edge reversed — both encode the
        # same locus. Accept either consistent representation:
        if oe[i] == 2 * fwd_edge:
            assert st[i] == expect_start
        else:
            conj = int(np.asarray(g.conj)[fwd_edge])
            assert oe[i] in (2 * fwd_edge + 1, 2 * conj, 2 * conj + 1)


def test_mapping_with_errors_majority_vote():
    genome = random_dna(300, 2)
    g = build([genome])
    idx = eidx.build_edge_index(g, K)
    r = genome[40:100]
    # error at position 30: kmers spanning it don't map; majority still wins
    r_err = r[:30] + ("A" if r[30] != "A" else "C") + r[31:]
    codes, lengths = dna.encode_reads([r_err])
    m = mapper.map_reads(idx, g.seq_len, codes, lengths, K)
    assert bool(np.asarray(m.mapped)[0])
    assert int(np.asarray(m.votes)[0]) >= 15


def test_insert_size_and_paired_index():
    genome = random_dna(600, 3)
    g = build([genome])
    idx = eidx.build_edge_index(g, K)

    rng = np.random.default_rng(4)
    L, IS = 50, 200
    r1s, r2s = [], []
    for _ in range(40):
        pos = int(rng.integers(0, 600 - IS))
        r1s.append(genome[pos:pos + L])
        r2s.append(nd.rc(genome[pos + IS - L:pos + IS]))
    c1, l1 = dna.encode_reads(r1s)
    c2, l2 = dna.encode_reads([nd.rc(r) for r in r2s])  # rc'd second mates
    m1 = mapper.map_reads(idx, g.seq_len, c1, l1, K)
    m2rc = mapper.map_reads(idx, g.seq_len, c2, l2, K)

    stats = insert_size.estimate_insert_size(m1, m2rc, l2)
    assert stats.count >= 35
    assert stats.median == pytest.approx(IS, abs=1)

    pi = pair_info.fill_paired_index(m1, m2rc, jnp.int32(IS - L))
    n = int(pi.num)
    assert n >= 1
    # single-edge genome: all observations are self-pairs at d ~ IS - L...
    # d = start1 - start2 + (IS - L) = -(IS - L) + (IS - L) = 0
    e1 = np.asarray(pi.e1)[:n]
    d = np.asarray(pi.dist)[:n]
    w = np.asarray(pi.weight)[:n]
    # dominant point has d == 0 (same-edge pairs at consistent spacing)
    assert d[np.argmax(w)] == 0
    clustered = pair_info.cluster_distances(pi, jnp.int32(5))
    nc = int(clustered.num)
    cd = np.asarray(clustered.dist)[:nc]
    cw = np.asarray(clustered.weight)[:nc]
    assert cd[np.argmax(cw)] == pytest.approx(0, abs=1)


def test_paired_index_two_edges_distance():
    # two separate contigs with mate pairs bridging them at known distance
    g1 = random_dna(300, 5)
    g2 = random_dna(300, 6)
    graph = build([g1, g2])
    idx = eidx.build_edge_index(graph, K)
    L, IS = 50, 250
    genome = g1 + g2  # pairs span the junction
    rng = np.random.default_rng(7)
    r1s, r2s = [], []
    for _ in range(30):
        pos = int(rng.integers(150, 300 - L))  # r1 in g1, r2 in g2
        r1s.append(genome[pos:pos + L])
        r2s.append(genome[pos + IS - L:pos + IS])
    c1, l1 = dna.encode_reads(r1s)
    c2, l2 = dna.encode_reads(r2s)  # already "rc'd twice" = forward
    m1 = mapper.map_reads(idx, graph.seq_len, c1, l1, K)
    m2rc = mapper.map_reads(idx, graph.seq_len, c2, l2, K)
    ok = np.asarray(m1.mapped) & np.asarray(m2rc.mapped)
    cross = ok & (np.asarray(m1.oriented_edge) !=
                  np.asarray(m2rc.oriented_edge))
    assert cross.sum() >= 10
    pi = pair_info.fill_paired_index(m1, m2rc, jnp.int32(IS - L))
    n = int(pi.num)
    e1 = np.asarray(pi.e1)[:n]
    e2 = np.asarray(pi.e2)[:n]
    d = np.asarray(pi.dist)[:n]
    w = np.asarray(pi.weight)[:n]
    inter = e1 != e2
    assert inter.any()
    # dominant inter-edge point: e2 starts 300 right of e1 start
    i = np.argmax(np.where(inter, w, 0))
    assert d[i] == pytest.approx(300, abs=2)


def test_chunked_pair_fill_matches_single_shot():
    """Device-merged chunked pair filling must reproduce the one-shot
    index (pair_info_count.cpp streamed-libraries semantics)."""
    import jax.numpy as jnp
    import numpy as np
    from spades_for_blackbird_tpu.mapping import mapper
    from spades_for_blackbird_tpu.paired import pair_info

    rng = np.random.default_rng(7)
    R, C = 300, 3
    def chains(seed):
        r = np.random.default_rng(seed)
        return mapper.ChainMapping(
            oriented_edge=jnp.asarray(
                r.integers(0, 12, (R, C)).astype(np.int32)),
            start=jnp.asarray(r.integers(0, 500, (R, C)).astype(np.int32)),
            votes=jnp.asarray(np.full((R, C), 5, np.int32)),
            chain_len=jnp.asarray(np.full((R,), C, np.int32)),
            mapped=jnp.asarray(r.random(R) < 0.9))
    ch1, ch2 = chains(1), chains(2)
    one = pair_info.fill_paired_index_multi(ch1, ch2, jnp.int32(150))
    chunked = pair_info.fill_paired_index_multi_chunked(
        ch1, ch2, jnp.int32(150), chunk=64)
    n = int(one.num)
    assert int(chunked.num) == n
    for f in ("e1", "e2", "dist"):
        np.testing.assert_array_equal(
            np.asarray(getattr(one, f)[:n]),
            np.asarray(getattr(chunked, f)[:n]), err_msg=f)
    np.testing.assert_allclose(np.asarray(one.weight[:n]),
                               np.asarray(chunked.weight[:n]), rtol=1e-6)
