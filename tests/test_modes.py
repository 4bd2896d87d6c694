"""Mode overlays + plasmid circularity tests (config_struct.hpp:38-50 mode
enum, chromosome_removal.cpp, circular output)."""

import numpy as np
import pytest

import naive_debruijn as nd
from spades_for_blackbird_tpu.graph import construct
from spades_for_blackbird_tpu.models import plasmid
from spades_for_blackbird_tpu.ops import dna
from spades_for_blackbird_tpu.pipeline.config import config_for_mode


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def test_mode_overlays():
    base = config_for_mode("isolate")
    meta = config_for_mode("meta")
    assert meta.two_step_rr and not base.two_step_rr
    assert meta.simplify.rounds == 3
    assert meta.simplify.ec_lb_additive == 30
    pl = config_for_mode("plasmid")
    assert pl.chromosome_removal and pl.circular_output
    rna = config_for_mode("rna")
    assert rna.ks == [33, 49]
    with pytest.raises(ValueError):
        config_for_mode("bogus")
    cfg = config_for_mode("isolate", careful=True)
    assert cfg.careful


def test_circular_contig_detection():
    K = 15
    core = random_dna(400, 1)
    circ_genome = core  # circular: reads wrap around
    wrap = circ_genome + circ_genome[:60]
    reads = [wrap[i:i + 50] for i in range(0, len(wrap) - 50 + 1, 3)]
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    contigs = plasmid.circular_contigs(g)
    circ = [c for c in contigs if c[2]]
    assert len(circ) >= 1
    seq = circ[0][0]
    assert len(seq) == 400
    # sequence is a rotation of the genome (cycle broken at arbitrary point)
    doubled = circ_genome + circ_genome
    assert seq in doubled or nd.rc(seq) in doubled


def test_chromosome_removal_keeps_plasmid():
    K = 15
    chrom = random_dna(3000, 2)
    plas = random_dna(350, 3)
    wrap = plas + plas[:60]
    reads = [chrom[i:i + 50] for i in range(0, 2950, 2)]          # ~25x
    reads += [wrap[i:i + 50] for i in range(0, len(wrap) - 50, 1)]  # ~50x
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    g2 = plasmid.remove_chromosomal(g, long_edge_threshold=1000,
                                    coverage_window=0.3)
    contigs = plasmid.circular_contigs(g2)
    circ = [c for c in contigs if c[2]]
    assert len(circ) >= 1 and len(circ[0][0]) == 350
    # the 3000bp chromosome edge must be gone
    assert all(len(c[0]) < 2500 for c in contigs)
