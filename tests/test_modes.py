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


def _plasmid_graph(K=15, chrom_len=3000, plas_len=1500, seed=2):
    chrom = random_dna(chrom_len, seed)
    plas = random_dna(plas_len, seed + 1)
    wrap = plas + plas[:60]
    reads = [chrom[i:i + 50] for i in range(0, chrom_len - 50, 2)]  # ~25x
    reads += [wrap[i:i + 50] for i in range(0, len(wrap) - 50, 1)]  # ~50x
    codes, lengths = dna.encode_reads(reads)
    return construct.graph_from_reads(codes, lengths, K), plas


def test_chromosome_removal_keeps_plasmid():
    g, plas = _plasmid_graph()
    g2 = plasmid.remove_chromosomal(g, long_edge_threshold=1000,
                                    coverage_window=0.3)
    contigs = plasmid.circular_contigs(g2)
    circ = [c for c in contigs if c[2]]
    assert len(circ) >= 1 and len(circ[0][0]) == len(plas)
    # the 3000bp chromosome edge must be gone
    assert all(len(c[0]) < 2500 for c in contigs)


def test_isolated_pipeline_filters_short_isolates():
    """FilterSmallComponents: a sub-min_isolated_length circular and a
    short linear leftover both get dropped; the real plasmid stays
    (chromosome_remover.cpp:480-489 rule c)."""
    K = 15
    g, plas = _plasmid_graph()
    # decoy: tiny 350bp circular (below min_isolated_length=1000)
    tiny = random_dna(350, 9)
    wrap = tiny + tiny[:60]
    reads = [wrap[i:i + 50] for i in range(0, len(wrap) - 50, 1)]
    from spades_for_blackbird_tpu.ops import dna as dna_ops
    codes, lengths = dna_ops.encode_reads(reads)
    g_tiny = construct.graph_from_reads(codes, lengths, K)
    out = plasmid.run_isolated_pipeline(g)
    contigs = plasmid.circular_contigs(out)
    circ = [c for c in contigs if c[2]]
    assert len(circ) == 1 and len(circ[0][0]) == len(plas)
    out_tiny = plasmid.run_isolated_pipeline(g_tiny)
    assert plasmid.circular_contigs(out_tiny) == []


def test_metaplasmid_iterate_finds_suspicious_component():
    """Rising-cutoff loop (pipeline.cpp:85-97): a 40x 2kb plasmid
    surfaces as a suspicious component while cutoffs are low, and is
    eliminated once the cutoff passes its coverage."""
    K = 15
    plas = random_dna(2000, 5)
    wrap = plas + plas[:60]
    reads = [wrap[i:i + 50] for i in range(0, len(wrap) - 50, 1)]  # ~50x
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    rounds = plasmid.metaplasmid_iterate(g)
    assert rounds, "no metaplasmid rounds ran"
    early_susp = [susp for cov, _, susp in rounds if cov <= 20]
    assert any(any(len(rec) > 0 for rec in susp) for susp in early_susp)
    # the component's sequence really is the plasmid
    found = False
    for cov, _, susp in rounds:
        for comp in susp:
            for _, seq, length, _ in comp:
                if length >= 2000 and (seq[:100] in (plas + plas)
                                       or nd.rc(seq)[:100] in (plas + plas)):
                    found = True
    assert found
    # once cutoff > 50x everything is gone
    last_cov, last_g, _ = rounds[-1]
    import numpy as _np
    from spades_for_blackbird_tpu.graph.graph import edge_mask
    assert last_cov > 50 or not _np.asarray(edge_mask(last_g)).any()


@pytest.mark.slow
def test_cli_metaplasmid_smoke(tmp_path):
    """metaplasmid CLI wiring: rising-cutoff chromosome removal emits
    per-cutoff suspicious components (components_NNNN.fasta,
    chromosome_remover.cpp:338) and the run completes."""
    from spades_for_blackbird_tpu import cli
    from spades_for_blackbird_tpu.utils import simulate

    chrom = random_dna(4000, 21)
    plas = random_dna(2000, 22)
    wrap = plas + plas[:70]
    reads = [chrom[i:i + 60] for i in range(0, len(chrom) - 60, 3)]  # ~20x
    reads += [wrap[i:i + 60] for i in range(0, len(wrap) - 60, 1)]   # ~60x
    fq = str(tmp_path / "reads.fastq.gz")
    simulate.write_fastq(fq, reads, ["I" * len(r) for r in reads])
    out = tmp_path / "out"
    rc_code = cli.main(["-s", fq, "-o", str(out), "-k", "21",
                        "--metaplasmid", "--only-assembler"])
    assert rc_code == 0
    comp_files = sorted(out.glob("components_*.fasta"))
    assert comp_files, "no suspicious-component output written"
    text = "".join(p.read_text() for p in comp_files)
    assert "CUTOFF_" in text and "COMPONENT_" in text
    # the plasmid sequence is among the emitted component edges
    seqs = [l.strip() for l in text.splitlines() if not l.startswith(">")]
    joined = "".join(seqs)
    assert plas[:80] in joined + joined or nd.rc(plas)[:80] in joined + joined


def test_mode_overlays_viral_family():
    """rnaviral/corona/metaviral/moleculo/large_genome overlays
    (config_struct.hpp:38-50 enum + *_mode.info parameter provenance)."""
    rv = config_for_mode("rnaviral")
    assert rv.ks == [21, 33, 49]          # generateK_for_rnaviral
    assert not rv.two_step_rr
    assert rv.simplify.bulge_min_identity == 0.9   # subspecies_br
    assert rv.simplify.bulge_max_rel_coverage == 15.0
    assert not rv.simplify.final_br_enabled
    assert rv.simplify.red_enabled and rv.simplify.red_edge_sum == 0
    assert rv.uneven_depth

    co = config_for_mode("corona")
    assert co.domain_matching                      # hmm_mode()
    assert co.ks == [21, 33, 49]

    mv = config_for_mode("metaviral")
    assert mv.chromosome_removal and mv.circular_output
    assert mv.plasmid_output_linear                # output_linear true
    assert mv.plasmid_min_linear_length == 500
    assert mv.simplify.bulge_min_identity == 0.7   # metaviral subspecies_br

    mo = config_for_mode("moleculo")
    assert mo.simplify.ec_icb == 3.1               # { ec_lb 30, icb 3.1 }
    assert mo.simplify.ec_lb_additive == 30
    assert mo.simplify.rcc_coverage_gap == 20.0
    assert mo.simplify.bulge_max_coverage == 3.0

    lg = config_for_mode("large_genome")
    assert lg.scaffolding_mode == "old_pe_2015"


@pytest.mark.slow
def test_cli_rnaviral_smoke(tmp_path):
    """rnaviral CLI wiring: a toy viral genome assembles through the
    rnaviral mode overlay (rnaviral_mode.info) end to end."""
    from spades_for_blackbird_tpu import cli
    from spades_for_blackbird_tpu.utils import simulate

    genome = random_dna(3000, 31)
    reads = [genome[i:i + 60] for i in range(0, len(genome) - 60, 2)]
    fq = str(tmp_path / "reads.fastq.gz")
    simulate.write_fastq(fq, reads, ["I" * len(r) for r in reads])
    out = tmp_path / "out"
    rc_code = cli.main(["-s", fq, "-o", str(out), "-k", "21",
                        "--rnaviral", "--only-assembler"])
    assert rc_code == 0
    seqs, cur = [], []
    for line in (out / "contigs.fasta").read_text().splitlines():
        if line.startswith(">"):
            if cur:
                seqs.append("".join(cur))
            cur = []
        else:
            cur.append(line.strip())
    if cur:
        seqs.append("".join(cur))
    best = max(seqs, key=len)
    assert len(best) >= 2500
    assert best[:80] in genome or nd.rc(best)[:80] in genome


@pytest.mark.slow
def test_cli_metaviral_smoke(tmp_path):
    """metaviral CLI wiring: chromosome removal runs and the distinct
    linear-candidate output (contigs.linears.fasta,
    contig_output_stage.cpp:231-240) is written."""
    from spades_for_blackbird_tpu import cli
    from spades_for_blackbird_tpu.utils import simulate

    chrom = random_dna(4000, 41)
    plas = random_dna(2000, 42)
    wrap = plas + plas[:70]
    reads = [chrom[i:i + 60] for i in range(0, len(chrom) - 60, 3)]
    reads += [wrap[i:i + 60] for i in range(0, len(wrap) - 60, 1)]
    fq = str(tmp_path / "reads.fastq.gz")
    simulate.write_fastq(fq, reads, ["I" * len(r) for r in reads])
    out = tmp_path / "out"
    rc_code = cli.main(["-s", fq, "-o", str(out), "-k", "21",
                        "--metaviral", "--only-assembler"])
    assert rc_code == 0
    assert (out / "contigs.circular.fasta").exists()
    assert (out / "contigs.linears.fasta").exists()
