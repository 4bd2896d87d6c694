"""RNA SS coverage, relative-coverage removal, graph JSON, --assembly-graph."""

import json

import numpy as np
import pytest
import jax.numpy as jnp

import naive_debruijn as nd
from spades_for_blackbird_tpu.graph import construct
from spades_for_blackbird_tpu.models import rna
from spades_for_blackbird_tpu.ops import dna
from spades_for_blackbird_tpu.simplify import passes
from spades_for_blackbird_tpu.simplify.recondense import recondense
from spades_for_blackbird_tpu.io import graph_json

K = 15


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def tile(s, L=50, step=5):
    r = [s[i:i + L] for i in range(0, len(s) - L + 1, step)]
    r.append(s[len(s) - L:])
    return r


def test_ss_coverage_counts_strands():
    genome = random_dna(300, 1)
    sense = tile(genome)                   # transcription: sense only
    codes, lengths = dna.encode_reads(sense * 2)
    g = construct.graph_from_reads(codes, lengths, K)
    fwd, rev = rna.strand_specific_coverage(g, codes, lengths)
    alive = np.asarray(passes.edge_mask(g))
    # one edge carries all reads on one strand, its conjugate none
    dominant = rna.dominant_strand_fraction(fwd, rev)[alive]
    totals = (fwd + rev)[alive]
    assert totals.max() >= len(sense)
    assert dominant[np.argmax(totals)] == 1.0
    arts = rna.antisense_artifact_edges(g, fwd, rev)
    assert arts.sum() >= 1


def test_relative_coverage_removal():
    a = random_dna(300, 2)
    b = random_dna(300, 3)
    chim = a[130:160] + b[130:160]  # low-coverage chimeric junction
    reads = tile(a) * 6 + tile(b) * 6 + [chim]
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    v_space = 4 * g.capacity
    g2 = passes.remove_relative_low_coverage(
        g, v_space, jnp.float32(5.0), jnp.int32(3 * K))
    g2 = recondense(g2, v_space)
    from spades_for_blackbird_tpu.io.fasta import graph_contigs
    seqs = {s for s, _ in graph_contigs(g2)}  # one per conjugate pair
    assert len(seqs) == 2
    assert all(s in (a, nd.rc(a), b, nd.rc(b)) for s in seqs)


def test_graph_json(tmp_path):
    genome = random_dna(200, 4)
    codes, lengths = dna.encode_reads([genome])
    g = construct.graph_from_reads(codes, lengths, K)
    p = tmp_path / "g.json"
    graph_json.write_graph_json(str(p), g)
    doc = json.loads(p.read_text())
    assert doc["k"] == K
    assert len(doc["links"]) == 1  # conjugate-collapsed single edge
    assert doc["links"][0]["length"] == 200


def test_cli_assembly_graph_input(tmp_path):
    from spades_for_blackbird_tpu import cli, tools
    genome = random_dna(400, 5)
    reads_p = tmp_path / "reads.fa"
    reads_p.write_text("".join(
        f">r{i}\n{r}\n" for i, r in enumerate(tile(genome))))
    gfa_p = str(tmp_path / "g.gfa")
    assert tools.main(["gbuilder", str(reads_p), "-k", "15",
                       "--gfa", gfa_p]) == 0
    out = tmp_path / "out"
    rc = cli.main(["-s", str(reads_p), "--assembly-graph", gfa_p,
                   "-o", str(out), "--only-assembler"])
    assert rc == 0
    log = (out / "spades.log").read_text()
    assert "loaded graph from" in log
    contigs = (out / "contigs.fasta").read_text()
    assert "NODE_1_length_400" in contigs
