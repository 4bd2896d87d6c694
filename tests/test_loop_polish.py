"""Loop traverser (loop_traverser.cpp) + path polisher
(path_polisher.cpp) behavior on constructed tandem-repeat graphs."""

import numpy as np
import pytest

from spades_for_blackbird_tpu.graph import condense
from spades_for_blackbird_tpu.graph.graph import compact_graph, edge_mask
from spades_for_blackbird_tpu.kmers import counter, extension
from spades_for_blackbird_tpu.ops import dna
from spades_for_blackbird_tpu.path_extend import (loop_traverser, polisher,
                                                  resolver)

K = 21


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def build(genome, k=K):
    reads = [genome[i:i + 60] for i in range(0, len(genome) - 60 + 1)]
    codes, lengths = dna.encode_reads(reads)
    kp1 = counter.count_kmers(codes, lengths, k + 1)
    vt = extension.build_vertex_table(kp1, k)
    g = condense.build_graph(kp1, vt, k)
    g, _ = compact_graph(g)
    return g


def test_loop_traverser_joins_tandem_repeat():
    import jax.numpy as jnp
    from spades_for_blackbird_tpu.paired.pair_info import PairedIndex
    from spades_for_blackbird_tpu.path_extend import scaffolder

    a = random_dna(400, 1)
    r = random_dna(120, 2)
    b = random_dna(400, 3)
    genome = a + r + r + b
    g = build(genome)
    seq_len = np.asarray(g.seq_len)
    alive = np.asarray(edge_mask(g))
    conj = np.asarray(g.conj)
    longs = [int(e) for e in np.nonzero(alive)[0] if seq_len[e] >= 300]
    found = None
    for e1 in longs:
        for e2 in longs:
            if e2 in (e1, int(conj[e1])):
                continue
            ps = resolver.PathSet(paths=[[e1], [e2]])
            joins = loop_traverser.traverse_loops(
                g, ps, min_edge_length=300, max_component_size=10,
                max_path_length=1000)
            if len(joins) == 1:
                found = (ps, joins)
                break
        if found:
            break
    assert found is not None, "no loop was traversed"
    ps, joins = found
    # joins carry the reference's k + BASIC_N_CNT gap
    assert joins[0][2] == K + loop_traverser.BASIC_N_CNT
    empty = PairedIndex(e1=jnp.zeros(1, jnp.int32),
                        e2=jnp.zeros(1, jnp.int32),
                        dist=jnp.zeros(1, jnp.int32),
                        weight=jnp.zeros(1, jnp.float32),
                        num=jnp.int32(0))
    chains = scaffolder.scaffold_paths(g, ps, empty, forced_joins=joins)
    assert len(chains) == 1
    [(seq, _)] = scaffolder.scaffolds_to_contigs(g, chains)
    # scaffold = entry path + N run + exit path
    assert "N" * 10 in seq
    left, right = seq.split("N" * (K + loop_traverser.BASIC_N_CNT))
    comp = str.maketrans("ACGT", "TGCA")
    rc = lambda s: s.translate(comp)[::-1]
    assert left in genome or rc(left) in genome
    assert right in genome or rc(right) in genome


def test_polisher_fills_unique_gap_path():
    a = random_dna(400, 4)
    m = random_dna(150, 5)
    b = random_dna(400, 6)
    genome = a + m + b
    # divergent branch reads at both M boundaries force junctions so the
    # graph splits into A -> M -> B edges (plus short branch tips)
    flip = {"A": "C", "C": "G", "G": "T", "T": "A"}
    alt1 = a[-40:] + "".join(flip[c] for c in m[:20])
    alt2 = "".join(flip[c] for c in m[-20:]) + b[:40]
    reads = [genome[i:i + 60]
             for i in range(0, len(genome) - 60 + 1)] + [alt1, alt2] * 3
    codes, lengths = dna.encode_reads(reads)
    kp1 = counter.count_kmers(codes, lengths, K + 1)
    vt = extension.build_vertex_table(kp1, K)
    g = condense.build_graph(kp1, vt, K)
    g, _ = compact_graph(g)
    seq_len = np.asarray(g.seq_len)
    alive = np.asarray(edge_mask(g))
    start_v = np.asarray(g.start_v)
    end_v = np.asarray(g.end_v)
    # find a triple eA -> eM -> eB (graph-adjacent)
    ids = [int(e) for e in np.nonzero(alive)[0]]
    triple = None
    for eA in ids:
        for eM in ids:
            if int(end_v[eA]) != int(start_v[eM]) or eM == eA:
                continue
            for eB in ids:
                if eB in (eA, eM):
                    continue
                if int(end_v[eM]) == int(start_v[eB]):
                    triple = (eA, eM, eB)
                    break
            if triple:
                break
        if triple:
            break
    assert triple is not None
    eA, eM, eB = triple
    gap = int(seq_len[eM])
    chains = [[(eA, 0), (eB, gap)]]
    polished, closed = polisher.polish_scaffolds(g, chains,
                                                 max_path_len=2000)
    assert closed == 1
    assert [e for e, _ in polished[0]] == [eA, eM, eB]
    assert all(gp == 0 for _, gp in polished[0])
