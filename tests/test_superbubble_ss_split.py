"""Superbubble collapse + strand-specific edge splitting (rnaSPAdes).

Mirrors the reference's superbubble_finder.hpp:21 semantics (dominated
vertex growth, heaviest path kept) and ss_edge_split.cpp:17-59 (split
edges where the transcribed strand flips).
"""

import numpy as np
import jax.numpy as jnp

import naive_debruijn as nd
from spades_for_blackbird_tpu.graph import construct
from spades_for_blackbird_tpu.models import rna
from spades_for_blackbird_tpu.ops import dna
from spades_for_blackbird_tpu.simplify import passes
from spades_for_blackbird_tpu.simplify.recondense import recondense
from spades_for_blackbird_tpu.simplify.superbubble import (
    collapse_superbubbles)

K = 15


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def tile(s, L=50, step=5):
    r = [s[i:i + L] for i in range(0, len(s) - L + 1, step)]
    r.append(s[len(s) - L:])
    return r


def contig_seqs(g):
    from spades_for_blackbird_tpu.io.fasta import graph_contigs
    return {s for s, _ in graph_contigs(g)}


def test_superbubble_three_paths_keeps_heaviest():
    # stem -> three interior variants -> stem: a 3-path superbubble whose
    # interiors each differ in the middle; two-edge remove_bulges cannot
    # see it as a whole, superbubble collapse can.
    pre = random_dna(120, 10)
    post = random_dna(120, 11)
    mid_a = random_dna(40, 12)
    mid_b = mid_a[:18] + ("A" if mid_a[18] != "A" else "C") + mid_a[19:]
    mid_c = mid_a[:30] + ("G" if mid_a[30] != "G" else "T") + mid_a[31:]
    # heaviest: path A (most reads)
    reads = (tile(pre + mid_a + post) * 6 +
             tile(pre + mid_b + post) * 2 +
             tile(pre + mid_c + post) * 2)
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    v_space = 4 * g.capacity
    g2, nb = collapse_superbubbles(g, max_length=400)
    assert nb >= 1
    g2 = recondense(g2, v_space)
    seqs = contig_seqs(g2)
    want = pre + mid_a + post
    assert len(seqs) == 1
    assert seqs == {want} or seqs == {nd.rc(want)}


def test_superbubble_ignores_long_interiors():
    pre = random_dna(100, 20)
    post = random_dna(100, 21)
    mid_a = random_dna(60, 22)
    mid_b = random_dna(60, 23)  # completely different interior (still a
    # 2-path bubble topologically, but long)
    reads = tile(pre + mid_a + post) * 4 + tile(pre + mid_b + post) * 4
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    before = int(np.asarray(passes.edge_mask(g)).sum())
    g2, nb = collapse_superbubbles(g, max_length=30)  # too strict
    after = int(np.asarray(passes.edge_mask(g2)).sum())
    assert nb == 0 and before == after


def test_ss_split_edge_with_strand_flip():
    # one linear genome; left half transcribed sense, right half antisense
    genome = random_dna(700, 30)
    left = genome[:380]
    right = genome[320:]
    sense_reads = tile(left) * 3
    anti_reads = [nd.rc(r) for r in tile(right)] * 3
    codes, lengths = dna.encode_reads(sense_reads + anti_reads)
    g = construct.graph_from_reads(codes, lengths, K)
    alive = np.asarray(passes.edge_mask(g))
    assert alive.sum() == 2  # single unitig + conjugate
    g2, n, v_space = rna.split_edges_by_strand(
        g, codes, lengths, bin_size=50, min_edge_len=200,
        coverage_margin=3.0)
    assert n == 1
    alive2 = np.asarray(passes.edge_mask(g2))
    assert alive2.sum() == 4  # two pieces + conjugates
    # pieces overlap by k and concatenate back to the genome
    lens = np.asarray(g2.seq_len)[alive2]
    assert sorted(lens)[0] + sorted(lens)[-1] - K == len(genome) or \
        int(lens.sum()) // 2 - K == len(genome)
    # conjugate invariants hold
    conj = np.asarray(g2.conj)
    for e in np.nonzero(alive2)[0]:
        assert conj[conj[e]] == e
        assert np.asarray(g2.start_v)[e] == \
            (np.asarray(g2.end_v)[conj[e]] ^ 1)


def test_ss_split_no_flip_no_change():
    genome = random_dna(600, 31)
    reads = tile(genome) * 4  # all sense
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    g2, n, _ = rna.split_edges_by_strand(g, codes, lengths, bin_size=50,
                                         min_edge_len=200)
    assert n == 0


def test_binned_coverage_strands():
    genome = random_dna(400, 32)
    sense = tile(genome[:200]) * 2
    anti = [nd.rc(r) for r in tile(genome[180:])] * 2
    codes, lengths = dna.encode_reads(sense + anti)
    g = construct.graph_from_reads(codes, lengths, K)
    fwd, rev = rna.binned_strand_coverage(g, codes, lengths, bin_size=50)
    # some edge must show forward-heavy and reverse-heavy bins
    tot_f, tot_r = fwd.sum(), rev.sum()
    assert tot_f > 0 and tot_r > 0
