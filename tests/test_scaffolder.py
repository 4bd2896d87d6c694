"""Scaffolding + chunked counting tests."""

import numpy as np
import pytest
import jax.numpy as jnp

import naive_debruijn as nd
from spades_for_blackbird_tpu.graph import construct
from spades_for_blackbird_tpu.kmers import counter
from spades_for_blackbird_tpu.ops import dna
from spades_for_blackbird_tpu.pipeline import assemble

K = 15


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def test_scaffold_joins_gap_with_ns():
    # genome with an unsequencable middle: reads cover [0,300) and
    # [380,700) only; mates at IS=250 span the 80bp hole
    genome = random_dna(700, 1)
    L, IS = 50, 250
    reads = [genome[i:i + L] for i in range(0, 251, 4)]
    reads += [genome[i:i + L] for i in range(380, 651, 4)]
    r1s, r2s = [], []
    for pos in range(180, 420, 3):
        r1 = genome[pos:pos + L]
        r2 = nd.rc(genome[pos + IS - L:pos + IS])
        r1s.append(r1)
        r2s.append(r2)
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    c1, l1 = dna.encode_reads(r1s)
    c2, l2 = dna.encode_reads(r2s)
    contigs, scaffolds = assemble.repeat_resolution(
        g, c1, l1, c2, l2, with_scaffolds=True)
    # contigs: two pieces; scaffolds: one joined with ~80 Ns
    assert len([s for s, _ in contigs if len(s) > 100]) == 2
    top = scaffolds[0][0]
    assert "N" in top
    n_run = len(top) - len(top.replace("N", ""))
    assert 40 <= n_run <= 120, n_run
    left, right = top.split("N" * n_run)[0], top.rsplit("N" * n_run)[-1]
    assert left in genome or left in nd.rc(genome)
    assert right in genome or right in nd.rc(genome)


def test_chunked_counting_matches_single_pass():
    rng = np.random.default_rng(2)
    seqs = ["".join(rng.choice(list("ACGT"), size=70)) for _ in range(300)]
    codes, lengths = dna.encode_reads(seqs)
    whole = counter.count_kmers(jnp.asarray(codes), jnp.asarray(lengths), 21)
    chunked = counter.count_kmers_chunked(codes, lengths, 21,
                                          chunk_reads=64)
    nw, nc = int(whole.num), int(chunked.num)
    assert nw == nc
    assert (np.asarray(whole.kmers[:nw]) ==
            np.asarray(chunked.kmers[:nc])).all()
    assert (np.asarray(whole.counts[:nw]) ==
            np.asarray(chunked.counts[:nc])).all()
