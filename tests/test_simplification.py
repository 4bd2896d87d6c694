"""Simplification passes on synthetic error structures.

Mirrors assembler/src/test/debruijn/simplification_test.cpp: construct
graphs with known defects (tips, bulges, chimeric connections) and assert
the cleaned structure.
"""

import numpy as np
import pytest

import naive_debruijn as nd
from spades_for_blackbird_tpu.graph import condense
from spades_for_blackbird_tpu.kmers import counter, extension
from spades_for_blackbird_tpu.ops import dna
from spades_for_blackbird_tpu.simplify import passes, runner
from spades_for_blackbird_tpu.simplify.recondense import recondense

import jax.numpy as jnp

K = 15


def build_graph(seqs, k=K):
    codes, lengths = dna.encode_reads(seqs)
    kp1 = counter.count_kmers(codes, lengths, k + 1)
    vt = extension.build_vertex_table(kp1, k)
    g = condense.build_graph(kp1, vt, k)
    return g, 2 * vt.capacity


def edge_set(g):
    from spades_for_blackbird_tpu.graph.graph import edge_mask
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


def cover(genome, read_len=50, step=5):
    """Error-free tiling reads."""
    return [genome[i:i + read_len]
            for i in range(0, len(genome) - read_len + 1, step)]


def test_recondense_after_manual_delete():
    genome = random_dna(200, 1)
    g, v_space = build_graph([genome])
    # clean genome: 2 edges (fwd + rc). Now rebuild from a fork and delete
    # one branch: stem + 2 branches
    stem, b1, b2 = genome[:100], genome[100:150], random_dna(50, 2)
    g, v_space = build_graph([stem + b1, stem + b2])
    from spades_for_blackbird_tpu.graph.graph import edge_mask
    assert int(np.asarray(edge_mask(g)).sum()) == 6  # 3 per strand
    # kill the b2 branch (the edge whose seq ends with b2's tail)
    alive = np.asarray(edge_mask(g))
    flat = np.asarray(g.seq_flat)
    kill = np.zeros(g.capacity, bool)
    for e in np.nonzero(alive)[0]:
        s, ln = int(g.seq_start[e]), int(g.seq_len[e])
        seq = dna.decode_codes(flat[s:s + ln])
        if seq.endswith(b2[-20:]) or seq.startswith(nd.rc(b2)[:20]):
            kill[e] = True
    g2 = g._replace(alive=g.alive & ~jnp.asarray(kill))
    g2 = recondense(g2, v_space)
    assert edge_set(g2) == {stem + b1, nd.rc(stem + b1)}


def test_clip_tip():
    genome = random_dna(300, 3)
    reads = cover(genome)
    # one erroneous read: error at position 40 of a 50bp read -> tip of
    # length ~ (50-40-1)+K at the end of an otherwise clean path
    bad = genome[100:150]
    wrong = "A" if bad[40] != "A" else "C"
    reads.append(bad[:40] + wrong + bad[41:])
    g, v_space = build_graph(reads)
    assert len(edge_set(g)) > 2
    g = passes.clip_tips(g, v_space, jnp.int32(100), jnp.float32(1e6),
                         jnp.float32(2.0))
    g = recondense(g, v_space)
    assert edge_set(g) == {genome, nd.rc(genome)}


def test_remove_bulge():
    genome = random_dna(300, 4)
    reads = cover(genome)
    # error in the middle of a read, >K from read ends -> parallel bulge
    bad = genome[100:160]
    wrong = "A" if bad[30] != "A" else "C"
    mutated = bad[:30] + wrong + bad[31:]
    reads += [mutated, mutated]  # cov 2 bulge vs cov ~10 main
    g, v_space = build_graph(reads)
    assert len(edge_set(g)) > 2
    cov_before = {s: None for s in edge_set(g)}
    g = passes.remove_bulges(g, v_space, jnp.int32(3 * K),
                             jnp.float32(0.1), jnp.float32(1000.0))
    g = recondense(g, v_space)
    assert edge_set(g) == {genome, nd.rc(genome)}


def test_remove_erroneous_connection():
    g1 = random_dna(260, 5)
    g2 = random_dna(260, 6)
    reads = cover(g1) + cover(g2)
    # chimeric junction: one read jumping from g1 into g2 mid-way
    reads.append(g1[120:145] + g2[120:145])
    g, v_space = build_graph(reads)
    assert len(edge_set(g)) > 4
    g = passes.remove_erroneous_connections(
        g, v_space, jnp.int32(K + 35), jnp.float32(1.5))
    g = recondense(g, v_space)
    assert edge_set(g) == {g1, nd.rc(g1), g2, nd.rc(g2)}


def test_full_runner_cleans_noisy_reads():
    genome = random_dna(400, 7)
    rng = np.random.default_rng(8)
    # clean tiling (guarantees end coverage; random sampling leaves the
    # terminal k-mers at ~0-1x, which no assembler keeps) + noisy extras
    reads = cover(genome, read_len=60, step=10)
    for i in range(150):
        pos = int(rng.integers(0, 400 - 60))
        r = genome[pos:pos + 60]
        if rng.random() < 0.25:  # sprinkle single-base errors
            p = int(rng.integers(0, 60))
            r = r[:p] + "ACGT"[int(rng.integers(4))] + r[p + 1:]
        if rng.random() < 0.5:
            r = nd.rc(r)
        reads.append(r)
    g, v_space = build_graph(reads)
    cfg = runner.SimplifyConfig(read_length=60, rounds=4)
    g = runner.simplify_graph(g, v_space, ec_bound=2.0, cfg=cfg)
    assert edge_set(g) == {genome, nd.rc(genome)}


def _build_graph_for(reads, k=21):
    from spades_for_blackbird_tpu.graph import condense
    from spades_for_blackbird_tpu.graph.graph import compact_graph
    from spades_for_blackbird_tpu.kmers import counter, extension
    from spades_for_blackbird_tpu.ops import dna
    codes, lengths = dna.encode_reads(reads)
    kp1 = counter.count_kmers(codes, lengths, k + 1)
    vt = extension.build_vertex_table(kp1, k)
    g = condense.build_graph(kp1, vt, k)
    g, vs = compact_graph(g)
    return g, vs


def test_mismatch_tip_condition_mask():
    """MismatchTipCondition (tip_clipper.hpp:105): a dead-end edge whose
    bases match a longer sibling except for <= max_diff mismatches."""
    import numpy as np
    from spades_for_blackbird_tpu.graph.graph import edge_mask
    from spades_for_blackbird_tpu.simplify import advanced

    rng = np.random.default_rng(17)
    a = "".join(rng.choice(list("ACGT"), size=200))
    b = "".join(rng.choice(list("ACGT"), size=200))
    main = a + b
    # tip: diverges from b by 2 mismatches, then stops short
    tip_seq = list(b[:60])
    tip_seq[40] = {"A": "C", "C": "G", "G": "T", "T": "A"}[tip_seq[40]]
    tip_seq[50] = {"A": "C", "C": "G", "G": "T", "T": "A"}[tip_seq[50]]
    tip = a[-40:] + "".join(tip_seq)
    reads = [main[i:i + 60] for i in range(0, len(main) - 60 + 1)] + \
        [tip[i:i + 60] for i in range(0, len(tip) - 60 + 1, 5)]
    g, vs = _build_graph_for(reads)
    mask = advanced.mismatch_tip_mask(g, vs, 3.0)
    alive = np.asarray(edge_mask(g))
    lens = np.asarray(g.seq_len)
    # the short mismatch tip is flagged; the long main edges are not
    flagged = [int(lens[e]) for e in np.nonzero(mask & alive)[0]]
    assert flagged, "mismatch tip not flagged"
    assert max(flagged) < 150
    mask0 = advanced.mismatch_tip_mask(g, vs, 1.0)
    assert not (mask0 & alive).any(), "bound 1 must not flag 2-diff tip"


def test_low_complexity_tip_clipped():
    """LowComplexityTipClipper (rna_simplification.hpp:10): poly-A tips
    go, normal tips of the same shape stay."""
    import numpy as np
    from spades_for_blackbird_tpu.graph.graph import edge_mask
    from spades_for_blackbird_tpu.simplify import advanced

    rng = np.random.default_rng(23)
    a = "".join(rng.choice(list("ACGT"), size=200))
    b = "".join(rng.choice(list("ACGT"), size=200))
    main = a + b
    # A-rich but aperiodic (a pure poly-A run would collapse into a
    # self-loop k-mer, not a tip)
    polya_tip = a[-40:] + "".join(rng.choice(
        list("ACGT"), size=60, p=[0.88, 0.04, 0.04, 0.04]))
    reads = [main[i:i + 60] for i in range(0, len(main) - 60 + 1)] + \
        [polya_tip[i:i + 60] for i in range(0, len(polya_tip) - 60 + 1, 5)]
    g, vs = _build_graph_for(reads)
    before = int(np.asarray(edge_mask(g)).sum())
    g2, vs2, n = advanced.clip_low_complexity_tips(g, vs)
    assert n >= 1
    after = int(np.asarray(edge_mask(g2)).sum())
    assert after < before
