"""Advanced simplification: path bulges, rcc components, disconnector,
complex tips, hidden ECs (mirrors src/test/debruijn/simplification_test.cpp
fixtures built in code)."""

import numpy as np
import pytest

import naive_debruijn as nd
from spades_for_blackbird_tpu.graph import condense
from spades_for_blackbird_tpu.graph.graph import edge_mask
from spades_for_blackbird_tpu.kmers import counter, extension
from spades_for_blackbird_tpu.ops import dna
from spades_for_blackbird_tpu.simplify import advanced, passes
from spades_for_blackbird_tpu.simplify.recondense import recondense

K = 15


def build_graph(seqs, k=K):
    codes, lengths = dna.encode_reads(seqs)
    kp1 = counter.count_kmers(codes, lengths, k + 1)
    vt = extension.build_vertex_table(kp1, k)
    g = condense.build_graph(kp1, vt, k)
    from spades_for_blackbird_tpu.graph.graph import compact_graph
    return compact_graph(g)


def edge_set(g):
    alive = np.asarray(edge_mask(g))
    out = set()
    flat = np.asarray(g.seq_flat)
    for e in np.nonzero(alive)[0]:
        s, ln = int(g.seq_start[e]), int(g.seq_len[e])
        out.add(dna.decode_codes(flat[s:s + ln]))
    return out


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def cover(genome, read_len=50, step=5, times=1):
    return [genome[i:i + read_len]
            for i in range(0, len(genome) - read_len + 1, step)] * times


def test_path_bulge_with_interior_vertex():
    """A bulge whose alternative is a multi-edge PATH (side branch makes
    the interior a junction) — the device parallel-edge pass can't see
    it; the path-alternative remover must glue it."""
    genome = random_dna(400, 10)
    reads = cover(genome, times=4)
    # low-coverage mutated alternative of genome[100:200]
    seg = genome[100:200]
    wrong = "A" if seg[50] != "A" else "C"
    mutated = seg[:50] + wrong + seg[51:]
    reads += [mutated]
    # side branch leaving from inside the MAIN path (at genome[140:]) so
    # the main alternative is split into >1 edge
    side = genome[120:155] + random_dna(40, 11)
    reads += [side] * 4
    g, v_space = build_graph(reads)
    before = edge_set(g)
    assert not any(wrong in ("",) for _ in before)  # sanity
    g2, v_space, n = advanced.remove_path_bulges(
        g, v_space, max_length=3 * K + 100, max_coverage=1000.0,
        max_relative_coverage=1.1)
    assert n >= 1
    g2 = recondense(g2, v_space)
    # the mutated branch is gone; the side branch survives
    seqs = edge_set(g2)
    assert not any(mutated[40:60] in s for s in seqs)
    assert any(side[-20:] in s for s in seqs)


def test_rcc_component_removed():
    """Low-coverage chimeric connection between two high-coverage
    genomes is removed by the component-based rcc (needs high flanks on
    BOTH sides of both endpoints)."""
    g1 = random_dna(300, 20)
    g2 = random_dna(300, 21)
    reads = cover(g1, times=10) + cover(g2, times=10)
    # chimeric low-coverage join mid-g1 -> mid-g2
    reads.append(g1[120:150] + g2[120:150])
    g, v_space = build_graph(reads)
    assert len(edge_set(g)) > 4
    g3, v_space, n = advanced.remove_rcc_components(
        g, v_space, coverage_gap=5.0, length_bound=100,
        tip_allowing_length_bound=150,
        longest_connecting_path_bound=K + 30,
        vertex_count_limit=30)
    assert n >= 1
    g3 = recondense(g3, v_space)
    assert edge_set(g3) == {g1, nd.rc(g1), g2, nd.rc(g2)}


def test_disconnect_relative_low():
    """The meta disconnector detaches (then tip-clips) a relatively
    low-covered edge hanging between high-coverage sequence."""
    g1 = random_dna(500, 30)
    reads = cover(g1, times=20)
    # low-cov chimeric edge from mid-genome to mid-genome (far apart)
    reads.append(g1[100:130] + g1[300:330])
    g, v_space = build_graph(reads)
    g3, v_space, n = advanced.disconnect_relative_low(
        g, v_space, diff_mult=10.0, edge_sum=50)
    assert n >= 1
    g3 = recondense(g3, v_space)
    # after disconnection the chimera became a tip / isolated fragment
    import jax.numpy as jnp
    g3 = passes.clip_tips(g3, v_space, jnp.int32(100), jnp.float32(1e6),
                          jnp.float32(1e6))
    g3 = recondense(g3, v_space)
    g3 = passes.remove_isolated(g3, v_space, jnp.int32(100),
                                jnp.float32(1e18))
    g3 = recondense(g3, v_space)
    assert edge_set(g3) == {g1, nd.rc(g1)}


def test_complex_tip_clipped():
    """A dead-start trunk that forks into two branchlets, both rejoining
    the main path (a dominated blob, complex_tip_clipper.hpp:19): no
    single edge is a plain tip, yet the whole hanging component is junk
    and gets wiped by the complex tip clipper."""
    genome = random_dna(400, 40)
    reads = cover(genome, times=6)
    trunk = random_dna(30, 41)
    br_a = trunk + random_dna(20, 42) + genome[200:220]
    br_b = trunk + random_dna(20, 43) + genome[300:320]
    reads += [br_a, br_b]
    g, v_space = build_graph(reads)
    assert len(edge_set(g)) > 2
    g3, v_space, n = advanced.clip_complex_tips(
        g, v_space, max_edge_len=100, max_path_len=120)
    assert n >= 1
    g3 = recondense(g3, v_space)
    assert edge_set(g3) == {genome, nd.rc(genome)}


def test_hidden_ec_removed():
    """Hidden EC: a unique long in-edge forks into one strong and one
    weak continuation whose flank coverage is far below; the weak edge
    is disconnected at the fork."""
    stem = random_dna(1600, 50)
    strong = stem + random_dna(200, 51)
    weak_branch = stem[-30:] + random_dna(60, 52)
    reads = cover(strong, read_len=100, step=4, times=5)
    reads += [weak_branch]
    g, v_space = build_graph(reads)
    g3, v_space, n = advanced.remove_hidden_ec(
        g, v_space, uniqueness_length=100,
        unreliability_threshold=2.0, ec_threshold=100.0,
        relative_threshold=3.0)
    assert n >= 1
    g3 = recondense(g3, v_space)
    import jax.numpy as jnp
    g3 = passes.clip_tips(g3, v_space, jnp.int32(200), jnp.float32(1e6),
                          jnp.float32(1e6))
    g3 = recondense(g3, v_space)
    g3 = passes.remove_isolated(g3, v_space, jnp.int32(200),
                                jnp.float32(1e18))
    g3 = recondense(g3, v_space)
    seqs = edge_set(g3)
    assert any(strong[-50:] in s for s in seqs)
    assert not any(weak_branch[-20:] in s for s in seqs)


def test_flanking_coverage_present_and_merged():
    """Construction fills flank; recondense merges it with the
    HandleMerge window semantics (detail_coverage.hpp:92)."""
    genome = random_dna(300, 60)
    g, v_space = build_graph(cover(genome, times=3))
    assert g.flank is not None
    alive = np.asarray(edge_mask(g))
    fl = np.asarray(g.flank)[alive]
    cov = np.asarray(g.cov)[alive]
    assert np.all(fl > 0)
    # uniform-ish coverage: flank should be within a factor of the mean
    assert np.all(fl < cov * 5 + 10)


def test_max_flow_ec_removes_cross_edge():
    """MaxFlowECRemover (mf_ec_remover.hpp:357-501): two unique-flanked
    genomic paths with a spurious short cross edge between their
    junctions; the complete 2-unit flow never routes through the cross
    edge, whose endpoints land in different residual SCCs -> removed."""
    a = random_dna(120, 31)
    b = random_dna(120, 32)
    c = random_dna(120, 33)
    d = random_dna(120, 34)
    g1 = a + b
    g2 = c + d
    cross = g1[120 - K:120] + g2[120:120 + K]  # junction->junction
    reads = cover(g1, times=3) + cover(g2, times=3) + [cross, cross]
    g, vs = build_graph(reads)
    before = edge_set(g)
    assert any(len(s) < 60 for s in before), "cross edge missing"
    g2_, vs2, n = advanced.remove_max_flow_ec(
        g, vs, max_ec_length=30, uniqueness_length=50,
        plausibility_length=20)
    assert n >= 1
    after = edge_set(g2_)
    assert not any(len(s) < 60 for s in after)
    # genomic paths fully restored after recondense
    assert any(s in (g1, nd.rc(g1)) for s in after)
    assert any(s in (g2, nd.rc(g2)) for s in after)


def test_max_flow_ec_incomplete_flow_no_deletion():
    """With uniqueness pushed out of reach no sources/sinks exist, the
    flow is not complete, and nothing is deleted (the reference skips
    suspicious components, mf_ec_remover.hpp:483-486)."""
    a = random_dna(120, 41)
    b = random_dna(120, 42)
    g1 = a + b
    cross = g1[120 - K:120] + g1[:K]
    reads = cover(g1, times=3) + [cross]
    g, vs = build_graph(reads)
    before = edge_set(g)
    g2_, _, n = advanced.remove_max_flow_ec(
        g, vs, max_ec_length=30, uniqueness_length=10_000,
        plausibility_length=20)
    assert n == 0
    assert edge_set(g2_) == before


# --- MDA topology block remnants: trec / isec(thorns) / multiplicity ---

def test_trec_removes_low_coverage_chimera():
    """TopologyReliabilityRemoveErroneousEdges
    (single_cell_simplification.hpp:99-116): a short unreliable-coverage
    edge hanging off a unique-path junction goes; the genomic branches
    stay."""
    A = random_dna(250, 60)
    B = random_dna(250, 61)
    C = random_dna(250, 62)
    D = random_dna(250, 63)
    reads = cover(A + B, times=6) + cover(C + D, times=6)
    # chimeric join: end of A glued into the middle of D
    chim = (A + B)[235:265] + (C + D)[330:360]
    reads += [chim]
    g, v_space = build_graph(reads)
    n_before = int(np.asarray(edge_mask(g)).sum())
    g2, v_space, n = advanced.remove_tr_ec(
        g, v_space, max_ec_length=K + 100,
        uniqueness_length=100, unreliable_coverage=2.5)
    assert n >= 1
    # genomic paths intact: both genomes still spelled by the graph
    s = edge_set(g2)
    joined = "".join(sorted(s))
    assert any((A + B)[100:140] in e or nd.rc((A + B))[100:140] in e
               for e in s)


def test_thorn_remover_cuts_interstrand_connection():
    """RemoveThorns (isec, single_cell_simplification.hpp:78-97): an MDA
    interstrand chimera (forward strand into the reverse strand of a
    downstream locus) passes the topological + MDA thorn conditions and
    is removed."""
    G = random_dna(900, 70)
    reads = cover(G, times=6)
    # strand-jump chimera: + strand at ~300 jumps onto the - strand at
    # ~600; the conjugate locus is reachable forward within the span
    chim = G[285:315] + nd.rc(G[600:630])
    reads += [chim]
    g, v_space = build_graph(reads)
    g2, v_space, n = advanced.remove_thorns(
        g, v_space, max_ec_length=K + 100,
        uniqueness_length=50, span_distance=15000)
    assert n >= 1
    s = edge_set(g2)
    assert any(G[100:140] in e or nd.rc(G)[100:140] in e for e in s)


def test_multiplicity_counting_removes_ec_at_repeat_flank():
    """MultiplicityCountingRemoveErroneousEdges
    (single_cell_simplification.hpp:60-76): the in-flank of the junction
    is short (so plain unique-path uniqueness is weak), but multiplicity
    counting over the surrounding unique long edges certifies it, and
    the chimeric edge goes."""
    core = random_dna(300, 80)   # L1: long unique in-edge
    R = random_dna(20, 81)       # short connector
    L3 = random_dna(400, 82)     # long alternative out at u
    B = random_dna(300, 83)      # plausible continuation after R
    reads = cover(core + L3, times=6)
    reads += cover(core + R + B, times=6)
    # chimera E: hangs off w (the junction after R), pointing into the
    # middle of L3 so its end vertex has in-degree 2
    chim = (core + R)[-14 - 16:] + random_dna(20, 84) \
        + (core + L3)[500:530]
    reads += [chim]
    g, v_space = build_graph(reads)
    g2, v_space, n = advanced.remove_multiplicity_ec(
        g, v_space, max_ec_length=K + 100,
        uniqueness_length=100, plausibility_length=50)
    assert n >= 1
    s = edge_set(g2)
    assert any(B[100:140] in e or nd.rc(B)[100:140] in e for e in s)
