"""Repeat resolution: paired reads must resolve a two-copy repeat.

Mirrors the reference's path_extend tests (path_extend_test.cpp): a
genome A-R-B-R-C whose repeat R collapses into one edge is resolved into
the full genome by distance-consistent paired support.
"""

import numpy as np
import pytest

import naive_debruijn as nd
from spades_for_blackbird_tpu.graph import construct
from spades_for_blackbird_tpu.ops import dna
from spades_for_blackbird_tpu.pipeline import assemble

K = 15


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def make_paired(genome, L=50, IS=200, step=4):
    positions = list(range(0, len(genome) - IS + 1, step))
    if positions[-1] != len(genome) - IS:
        positions.append(len(genome) - IS)  # cover the genome tail
    r1s, r2s = [], []
    for pos in positions:
        r1s.append(genome[pos:pos + L])
        r2s.append(nd.rc(genome[pos + IS - L:pos + IS]))
    return r1s, r2s


def test_two_copy_repeat_resolved():
    A = random_dna(150, 1)
    R = random_dna(80, 2)
    B = random_dna(150, 3)
    C = random_dna(150, 4)
    genome = A + R + B + R + C

    r1s, r2s = make_paired(genome)
    all_reads = r1s + r2s
    codes, lengths = dna.encode_reads(all_reads)
    g = construct.graph_from_reads(codes, lengths, K)

    # the repeat collapses: expect >2 edges before resolution
    from spades_for_blackbird_tpu.io.fasta import graph_contigs
    pre = graph_contigs(g)
    assert len(pre) > 1, "repeat should fragment the unitig graph"

    c1, l1 = dna.encode_reads(r1s)
    c2, l2 = dna.encode_reads(r2s)
    contigs = assemble.repeat_resolution(g, c1, l1, c2, l2)
    top = contigs[0][0]
    assert top in (genome, nd.rc(genome)), \
        f"top len {len(top)} vs genome {len(genome)}"


def test_repeat_unresolvable_without_pairs_stays_split():
    # same genome but mate distance too short to span the repeat: the
    # resolver must NOT merge (no distance-consistent support crossing R)
    A = random_dna(150, 5)
    R = random_dna(120, 6)
    B = random_dna(150, 7)
    C = random_dna(150, 8)
    genome = A + R + B + R + C
    # IS=130 spans barely past R=120 from few positions; use IS=60 (no span)
    r1s, r2s = make_paired(genome, L=50, IS=60, step=4)
    codes, lengths = dna.encode_reads(r1s + r2s)
    g = construct.graph_from_reads(codes, lengths, K)
    c1, l1 = dna.encode_reads(r1s)
    c2, l2 = dna.encode_reads(r2s)
    contigs = assemble.repeat_resolution(g, c1, l1, c2, l2)
    tops = [s for s, _ in contigs]
    assert genome not in tops and nd.rc(genome) not in tops


@pytest.mark.parametrize("IS,rep_len", [(200, 80), (300, 120), (150, 60)])
def test_two_copy_repeat_varying_is(IS, rep_len):
    """VERDICT round-1 'done when': exact two-copy repeats resolve into
    single correct paths across insert sizes.

    Flanks must exceed the insert size: IS estimation (like the
    reference's InsertSizeCounter) needs pairs with both mates on one
    edge, i.e. unique edges longer than IS."""
    flank = IS + 100
    A = random_dna(flank, 100 + IS)
    R = random_dna(rep_len, 101 + IS)
    B = random_dna(flank, 102 + IS)
    C = random_dna(flank, 103 + IS)
    genome = A + R + B + R + C
    r1s, r2s = make_paired(genome, L=50, IS=IS, step=3)
    codes, lengths = dna.encode_reads(r1s + r2s)
    g = construct.graph_from_reads(codes, lengths, K)
    c1, l1 = dna.encode_reads(r1s)
    c2, l2 = dna.encode_reads(r2s)
    contigs = assemble.repeat_resolution(g, c1, l1, c2, l2)
    top = contigs[0][0]
    assert top in (genome, nd.rc(genome)), \
        f"IS={IS} rep={rep_len}: top len {len(top)} vs {len(genome)}"


def test_three_copy_repeat_resolved():
    """Three copies of the same repeat, three distinct contexts."""
    parts = [random_dna(320, 200 + i) for i in range(4)]
    R = random_dna(70, 210)
    genome = parts[0] + R + parts[1] + R + parts[2] + R + parts[3]
    r1s, r2s = make_paired(genome, L=50, IS=220, step=3)
    codes, lengths = dna.encode_reads(r1s + r2s)
    g = construct.graph_from_reads(codes, lengths, K)
    c1, l1 = dna.encode_reads(r1s)
    c2, l2 = dna.encode_reads(r2s)
    contigs = assemble.repeat_resolution(g, c1, l1, c2, l2)
    top = contigs[0][0]
    assert top in (genome, nd.rc(genome)), \
        f"top len {len(top)} vs {len(genome)}"


def test_diverged_repeat_copies_resolved():
    """Two repeat copies with ~3% divergence: simplification must NOT
    glue them into one bulge (coverage/length conditions), and if it
    keeps them separate the graph is trivially resolvable; if it
    collapses shared flanks the pair evidence must still recover the
    genome."""
    A = random_dna(160, 300)
    R1 = list(random_dna(90, 301))
    R2 = list(R1)
    # 3 scattered substitutions
    for pos in (20, 50, 75):
        R2[pos] = "A" if R1[pos] != "A" else "G"
    B = random_dna(160, 302)
    C = random_dna(160, 303)
    genome = A + "".join(R1) + B + "".join(R2) + C
    r1s, r2s = make_paired(genome, L=50, IS=200, step=3)
    codes, lengths = dna.encode_reads(r1s + r2s)
    g = construct.graph_from_reads(codes, lengths, K)
    c1, l1 = dna.encode_reads(r1s)
    c2, l2 = dna.encode_reads(r2s)
    contigs = assemble.repeat_resolution(g, c1, l1, c2, l2)
    top = contigs[0][0]
    assert top in (genome, nd.rc(genome)), \
        f"top len {len(top)} vs {len(genome)}"


def test_long_repeat_multiplicity_allows_both_traversals():
    """A collapsed 2-copy repeat longer than unique_edge_length but
    spanned by the insert: pair info resolves both exits, and the
    multiplicity gate (scaff_supplementary.cpp cov/median copy count)
    must allow the SECOND traversal instead of the old used-unique
    claim starving it — recovering the full genome."""
    A = random_dna(700, 11)   # longest: seeds first
    R = random_dna(400, 12)   # >= unique_edge_length 300, cov ~2x
    B = random_dna(500, 13)
    C = random_dna(500, 14)
    genome = A + R + B + R + C
    r1s, r2s = make_paired(genome, L=50, IS=600, step=3)
    codes, lengths = dna.encode_reads(r1s + r2s)
    g = construct.graph_from_reads(codes, lengths, K)
    c1, l1 = dna.encode_reads(r1s)
    c2, l2 = dna.encode_reads(r2s)
    contigs = assemble.repeat_resolution(g, c1, l1, c2, l2)
    top = max((s for s, _ in contigs), key=len)
    assert top in (genome, nd.rc(genome)), \
        f"top len {len(top)} vs genome {len(genome)}"


def test_long_reads_guide_repeat_resolution():
    """LongReadsExtensionChooser (extension_chooser.hpp:1108): long
    reads spanning A-R-B and B-R-C resolve the repeat exits that paired
    info (IS < |R|) cannot, recovering the full genome."""
    A = random_dna(700, 21)   # longest: seeds first
    R = random_dna(600, 22)
    B = random_dna(500, 23)
    C = random_dna(500, 24)
    genome = A + R + B + R + C
    r1s, r2s = make_paired(genome, L=50, IS=200, step=3)
    codes, lengths = dna.encode_reads(r1s + r2s)
    g = construct.graph_from_reads(codes, lengths, K)
    c1, l1 = dna.encode_reads(r1s)
    c2, l2 = dna.encode_reads(r2s)
    # error-free long reads tiling the genome with 1200bp windows,
    # dense enough that each repeat exit has weight > the chooser's
    # filtering threshold (2.0, extension_chooser.hpp:1162)
    lr = [genome[i:i + 1200] for i in range(0, len(genome) - 1200, 100)]
    lr.append(genome[-1200:])
    lc, ll = dna.encode_reads(lr)
    contigs = assemble.repeat_resolution_multi(
        g, [(c1, l1, c2, l2, "pe")], long_reads=(lc, ll))
    top = max((s for s, _ in contigs), key=len)
    assert top in (genome, nd.rc(genome)), \
        f"top len {len(top)} vs genome {len(genome)}"
