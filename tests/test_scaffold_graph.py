"""Explicit scaffold graph (scaffolder2015) structure tests."""

import numpy as np

import naive_debruijn as nd
from spades_for_blackbird_tpu.graph import construct
from spades_for_blackbird_tpu.mapping import chunked, index as eidx, mapper
from spades_for_blackbird_tpu.ops import dna
from spades_for_blackbird_tpu.paired import insert_size, pair_info
from spades_for_blackbird_tpu.path_extend import scaffold_graph as sgmod

K = 15


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def _gap_genome_setup():
    # two islands with an unsequencable 80 bp hole, mates spanning it
    genome = random_dna(700, 1)
    L, IS = 50, 250
    reads = [genome[i:i + L] for i in range(0, 251, 4)]
    reads += [genome[i:i + L] for i in range(380, 651, 4)]
    r1s, r2s = [], []
    for pos in range(180, 420, 3):
        r1s.append(genome[pos:pos + L])
        r2s.append(nd.rc(genome[pos + IS - L:pos + IS]))
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    c1, l1 = dna.encode_reads(r1s)
    c2, l2 = dna.encode_reads(r2s)
    import jax.numpy as jnp
    idx = eidx.build_edge_index(g, K + 1)
    c2r = dna.revcomp_reads(jnp.asarray(c2), jnp.asarray(l2))
    ch1 = chunked.map_reads_multi_chunked(
        idx, g.seq_len, jnp.asarray(c1), jnp.asarray(l1), K + 1,
        min_votes=1)
    ch2 = chunked.map_reads_multi_chunked(
        idx, g.seq_len, c2r, jnp.asarray(l2), K + 1, min_votes=1)
    ch1 = mapper.normalize_chain(ch1, g.conj)
    ch2 = mapper.normalize_chain(ch2, g.conj)

    def first(ch):
        return mapper.ReadMapping(
            oriented_edge=ch.oriented_edge[:, 0], start=ch.start[:, 0],
            votes=ch.votes[:, 0], mapped=ch.mapped)

    stats = insert_size.estimate_insert_size(
        first(ch1), first(ch2), np.asarray(l2))
    pi = pair_info.fill_paired_index_multi_chunked(
        ch1, ch2, jnp.int32(int(round(stats.median - L))))
    clustered = pair_info.cluster_distances(pi, jnp.int32(30))
    return g, clustered


def test_paired_condition_and_structure():
    g, clustered = _gap_genome_setup()
    sg = sgmod.scaffold_graph_from_paired(
        g, [clustered], min_weight=5.0, max_gap=10000)
    assert sg.vertex_count >= 2
    assert sg.edge_count >= 2  # at least the join + its conjugate
    # conjugate closure: for every paired record there is the mirrored
    # conj(dst) -> conj(src) record (scaffold_graph.cpp AddEdge)
    conj = np.asarray(g.conj)
    recs = {(int(s), int(d)) for s, d, c in
            zip(sg.src, sg.dst, sg.color) if c >= 0}
    for s, d in recs:
        assert (int(conj[d]), int(conj[s])) in recs
    # adjacency queries agree with the record table
    for v in sg.vertices:
        out = sg.outgoing(int(v))
        assert all(int(sg.src[i]) == int(v) for i in out)
        inc = sg.incoming(int(v))
        assert all(int(sg.dst[i]) == int(v) for i in inc)
    # degree sums match edge count
    assert sum(sg.out_degree(int(v)) for v in sg.vertices) == sg.edge_count


def test_unambiguous_joins_and_dumps():
    g, clustered = _gap_genome_setup()
    # paired condition only: the cross-hole join must be unambiguous
    sg = sgmod.scaffold_graph_from_paired(
        g, [clustered], min_weight=5.0, max_gap=10000,
        with_adjacency=False)
    joins = sg.unambiguous_joins()
    assert len(joins) >= 1
    # every join's gap is within the scaffold window
    for s, d, gap, w in joins:
        assert -g.k <= gap <= 10000
        assert w >= 5.0
    tsv = sg.to_tsv()
    assert tsv.startswith("#src\tdst")
    assert len(tsv.strip().split("\n")) == sg.edge_count + 1
    dot = sg.to_dot(g)
    assert dot.startswith("digraph") and "->" in dot


def test_adjacency_condition_linear_graph():
    # linear genome -> single unitig: no self adjacency records
    genome = random_dna(300, 3)
    reads = [genome[i:i + 60] for i in range(0, 241, 3)]
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    src, dst, color, weight, gap = sgmod.adjacency_connection_records(g)
    assert (color == -1).all()
    assert (gap == -K).all()
    # adjacency on a condensed graph links only distinct edges at
    # shared junction vertices; a pure linear graph has none
    assert (src != dst).all()
