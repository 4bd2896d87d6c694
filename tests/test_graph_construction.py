"""Graph construction (extension masks + condensation) vs the naive oracle.

Mirrors assembler/src/test/debruijn/construction_test.cpp: build graphs
from tiny read sets and compare structure.
"""

import numpy as np
import pytest

import naive_debruijn as nd
from spades_for_blackbird_tpu.graph import construct, graph as graph_mod
from spades_for_blackbird_tpu.kmers import counter, extension
from spades_for_blackbird_tpu.ops import dna


def build(seqs, k, min_count=1):
    codes, lengths = dna.encode_reads(seqs)
    return construct.graph_from_reads(codes, lengths, k, min_count=min_count)


def edge_strings(g):
    """All alive edge sequences as strings, with coverage."""
    n = int(g.num_edges)
    alive = np.asarray(g.alive)
    seq_flat = np.asarray(g.seq_flat)
    out = []
    for e in range(n):
        if not alive[e]:
            continue
        s = int(g.seq_start[e])
        ln = int(g.seq_len[e])
        out.append((dna.decode_codes(seq_flat[s:s + ln]), float(g.cov[e])))
    return out


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.mark.parametrize("k", [5, 15, 21])
def test_vertex_masks_match_naive(k):
    seqs = [random_dna(60, 1), random_dna(45, 2)]
    codes, lengths = dna.encode_reads(seqs)
    kp1 = counter.count_kmers(codes, lengths, k + 1)
    vt = extension.build_vertex_table(kp1, k)

    kp1_counts = nd.canonical_counts(seqs, k + 1)
    _, out_nbr, in_nbr = nd.vertex_masks(kp1_counts, k)
    kmer_set = set(out_nbr) | set(in_nbr)
    canon_set = {nd.canon(s) for s in kmer_set}

    n = int(vt.num)
    assert n == len(canon_set)
    for i in range(n):
        km = dna.decode_codes(np.asarray(dna.unpack_kmers(vt.kmers[i][None], k))[0])
        assert km in canon_set
        out_bits = {b for b in "ACGT"
                    if int(vt.out_mask[i]) & (1 << "ACGT".index(b))}
        in_bits = {b for b in "ACGT"
                   if int(vt.in_mask[i]) & (1 << "ACGT".index(b))}
        assert out_bits == out_nbr.get(km, set()), km
        assert in_bits == in_nbr.get(km, set()), km


@pytest.mark.parametrize("k", [15, 21, 33])
def test_single_clean_sequence_one_edge_pair(k):
    genome = random_dna(300, 42)
    # precondition: all (k+1)-mers unique (holds for k >= 15 on 300bp)
    assert max(nd.canonical_counts([genome], k + 1).values()) == 1
    g = build([genome], k)
    edges = edge_strings(g)
    assert sorted(s for s, _ in edges) == sorted([genome, nd.rc(genome)])
    for _, cov in edges:
        assert cov == pytest.approx(1.0)
    # conjugate pairing
    conj = np.asarray(g.conj)
    for e in range(int(g.num_edges)):
        assert conj[conj[e]] == e


@pytest.mark.parametrize("k,seed,nreads", [(5, 0, 30), (11, 1, 20),
                                           (15, 2, 40), (21, 3, 25)])
def test_unitigs_match_naive_random_reads(k, seed, nreads):
    rng = np.random.default_rng(seed)
    genome = random_dna(400, seed + 100)
    reads = []
    for _ in range(nreads):
        pos = rng.integers(0, 400 - 60)
        r = genome[pos:pos + 60]
        if rng.random() < 0.5:
            r = nd.rc(r)
        # sprinkle errors to create bulges/tips
        if rng.random() < 0.3:
            p = int(rng.integers(0, 60))
            r = r[:p] + rng.choice(list("ACGT")) + r[p + 1:]
        reads.append(r)
    g = build(reads, k)
    got = sorted(s for s, _ in edge_strings(g))
    expect_list, leftovers = nd.unitigs(reads, k)
    if leftovers:
        pytest.skip("naive oracle found perfect cycles; covered elsewhere")
    expect = sorted(s for s, _ in expect_list)
    assert got == expect
    # coverage agreement
    got_cov = dict(edge_strings(g))
    for s, cov in expect_list:
        assert got_cov[s] == pytest.approx(cov), s


@pytest.mark.parametrize("k", [5, 15, 21])
def test_circular_genome(k):
    core = random_dna(200, 7)
    circ = core + core[:k + 40]  # linear reads covering the wrap
    g = build([circ, nd.rc(circ)], k)
    edges = edge_strings(g)
    # a circular genome with unique kmers condenses to one cycle per strand;
    # we break cycles deterministically -> 2 edges, each len 200 + k
    # (not exact: the linearized read has junction at wrap only if kmers
    # repeat). Just assert structural sanity:
    total = sum(len(s) for s, _ in edges)
    assert total > 0
    stats = construct.graph_stats(g)
    assert stats["edges"] == len(edges)


def test_fork_two_out_edges():
    # two sequences sharing a prefix: X + A-branch / X + B-branch
    k = 5
    x = "ACGTACCGGA"
    s1 = x + "TTTCGA"
    s2 = x + "GCATCC"
    g = build([s1, s2], k)
    edges = edge_strings(g)
    seqs = sorted(s for s, _ in edges)
    # naive oracle agreement
    expect_list, leftovers = nd.unitigs([s1, s2], k)
    assert not leftovers
    assert seqs == sorted(s for s, _ in expect_list)
    # fork structure: shared prefix edge ends where branches start
    # (3 edges per strand: stem + 2 branches)
    assert len(seqs) == 6


def test_degrees_consistency():
    k = 11
    reads = [random_dna(80, i) for i in range(5)]
    g = build(reads, k)
    v_space = 4 * g.capacity
    out_deg, in_deg = graph_mod.degrees(g, v_space)
    # conjugate symmetry: out_deg[v] == in_deg[v^1]
    od, idg = np.asarray(out_deg), np.asarray(in_deg)
    v = np.arange(v_space)
    assert (od[v] == idg[v ^ 1]).all()


def test_deep_multiword_k77_pipeline():
    """k=77 ((k+1)=78 -> 5-word keys) through construction: exercises
    multi-word shifts/truncation beyond the common 2-word path."""
    genome = random_dna(400, 99)
    reads = [genome[i:i + 150] for i in range(0, 251, 10)]
    reads.append(genome[250:400])
    codes, lengths = dna.encode_reads(reads)
    g = build_from_arrays(codes, lengths, 77)
    edges = edge_strings(g)
    seqs = sorted(s for s, _ in edges)
    assert genome in seqs or nd.rc(genome) in seqs


def build_from_arrays(codes, lengths, k):
    return construct.graph_from_reads(codes, lengths, k)
