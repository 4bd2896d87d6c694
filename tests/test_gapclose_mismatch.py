"""Gap closing + mismatch correction stage tests
(projects/spades/gap_closer.cpp, mismatch_correction.cpp equivalents)."""

import numpy as np
import pytest
import jax.numpy as jnp

import naive_debruijn as nd
from spades_for_blackbird_tpu.graph import construct
from spades_for_blackbird_tpu.io.fasta import graph_contigs
from spades_for_blackbird_tpu.ops import dna
from spades_for_blackbird_tpu.pipeline import gap_closer, mismatch_correction

K = 15


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def tile(s, L=50, step=5):
    reads = [s[i:i + L] for i in range(0, len(s) - L + 1, step)]
    if (len(s) - L) % step:
        reads.append(s[len(s) - L:])
    return reads


def test_gap_closer_joins_overlapping_tips():
    genome = random_dna(700, 1)
    # k-mer coverage gap with a 12-base physical overlap (< K=15):
    # region A = [0, 362), region B = [350, 700) share 12 bases
    reads = tile(genome[:362]) + tile(genome[350:])
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    pre = {s for s, _ in graph_contigs(g)}
    assert genome not in pre and nd.rc(genome) not in pre
    assert len(pre) == 2  # two separate unitigs (canonical)

    # mate pairs spanning the junction
    IS, L = 250, 50
    r1s, r2s = [], []
    for pos in range(200, 400, 5):
        r1s.append(genome[pos:pos + L])
        r2s.append(nd.rc(genome[pos + IS - L:pos + IS]))
    c1, l1 = dna.encode_reads(r1s)
    c2, l2 = dna.encode_reads(r2s)
    g2, joined = gap_closer.close_gaps(g, c1, l1, c2, l2, min_overlap=10)
    assert joined == 1
    post = {s for s, _ in graph_contigs(g2)}
    assert genome in post or nd.rc(genome) in post


def test_mismatch_correction_fixes_consensus_error():
    genome = random_dna(400, 2)
    reads = tile(genome, L=60, step=3)
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)

    # corrupt one base mid-edge in the graph (simulating an assembly
    # consensus error that reads outvote)
    flat = np.asarray(g.seq_flat).copy()
    alive = np.asarray(g.alive)
    target = None
    for e in np.nonzero(alive)[0]:
        s, ln = int(g.seq_start[e]), int(g.seq_len[e])
        seq = dna.decode_codes(flat[s:s + ln])
        if seq == genome:
            target = (e, s, ln)
            break
    assert target is not None
    e, s, ln = target
    pos = s + 200
    flat[pos] = (flat[pos] + 1) % 4
    # conjugate edge must carry the same corruption (mirror invariant)
    conj = int(np.asarray(g.conj)[e])
    cs = int(g.seq_start[conj])
    flat[cs + (ln - 1 - 200)] = 3 - flat[pos] + 0  # rc position, complement
    flat[cs + (ln - 1 - 200)] = 3 - int(flat[pos])
    g_bad = g._replace(seq_flat=jnp.asarray(flat))
    bad = {sq for sq, _ in graph_contigs(g_bad)}
    assert genome not in bad and nd.rc(genome) not in bad

    g_fixed, n = mismatch_correction.correct_mismatches(
        g_bad, codes, lengths)
    assert n >= 1
    fixed = {sq for sq, _ in graph_contigs(g_fixed)}
    assert genome in fixed or nd.rc(genome) in fixed


def test_mismatch_correction_noop_on_clean_graph():
    genome = random_dna(300, 3)
    reads = tile(genome, L=50, step=5)
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    g2, n = mismatch_correction.correct_mismatches(g, codes, lengths)
    assert n == 0


def test_gap_closer_tolerates_mismatch_in_overlap():
    """An overlap carrying 1-2 mismatches must still close, with the
    lower-coverage tip corrected to the higher-coverage one
    (gap_closer.cpp:327 HandlePositiveHammingDistanceCase)."""
    genome = random_dna(700, 7)
    # part A tiled thin (low coverage), with its last overlap base
    # corrupted; part B tiled dense (high coverage)
    part_a = genome[:362]
    bad = list(part_a)
    bad[356] = {"A": "C", "C": "A", "G": "T", "T": "G"}[bad[356]]
    part_a_bad = "".join(bad)
    reads = tile(part_a_bad, step=9) + tile(genome[350:], step=2)
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    pre = {s for s, _ in graph_contigs(g)}
    assert genome not in pre and nd.rc(genome) not in pre

    IS, L = 250, 50
    r1s, r2s = [], []
    for pos in range(200, 400, 5):
        r1s.append(genome[pos:pos + L])
        r2s.append(nd.rc(genome[pos + IS - L:pos + IS]))
    c1, l1 = dna.encode_reads(r1s)
    c2, l2 = dna.encode_reads(r2s)
    g2, joined = gap_closer.close_gaps(g, c1, l1, c2, l2, min_overlap=10)
    assert joined == 1
    post = {s for s, _ in graph_contigs(g2)}
    # the corrected join reproduces the true genome (mismatch fixed
    # toward the dense B tiling)
    assert genome in post or nd.rc(genome) in post
