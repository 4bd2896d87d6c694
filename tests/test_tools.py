"""Standalone tool CLI tests (SURVEY.md §2.10 binaries)."""

import numpy as np
import pytest

import naive_debruijn as nd
from spades_for_blackbird_tpu import tools
from spades_for_blackbird_tpu.ops import dna


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture
def reads_file(tmp_path):
    genome = random_dna(300, 1)
    reads = [genome[i:i + 50] for i in range(0, 251, 5)]
    p = tmp_path / "reads.fa"
    p.write_text("".join(f">r{i}\n{r}\n" for i, r in enumerate(reads)))
    return str(p), genome


def test_gbuilder(reads_file, tmp_path):
    path, genome = reads_file
    gfa_out = str(tmp_path / "g.gfa")
    uni_out = str(tmp_path / "u.fasta")
    rc = tools.main(["gbuilder", path, "-k", "15", "--gfa", gfa_out,
                     "--unitigs", uni_out])
    assert rc == 0
    from spades_for_blackbird_tpu.io import fastq
    _, seqs = fastq.read_sequences(uni_out)
    assert genome in seqs or nd.rc(genome) in seqs
    assert open(gfa_out).read().startswith("H\t")


def test_kmercount(reads_file, tmp_path, capsys):
    path, genome = reads_file
    out = str(tmp_path / "counts.tsv")
    rc = tools.main(["kmercount", path, "-k", "15", "-o", out])
    assert rc == 0
    lines = open(out).read().splitlines()
    import naive_debruijn as nd2
    reads = [genome[i:i + 50] for i in range(0, 251, 5)]
    expect = nd2.canonical_counts(reads, 15)
    got = dict(l.split("\t") for l in lines)
    assert len(got) == len(expect)
    for km, c in expect.items():
        assert int(got[km]) == c


def test_kmer_estimating(reads_file, capsys):
    path, genome = reads_file
    rc = tools.main(["kmer-estimating", path, "-k", "15"])
    assert rc == 0
    est = float(capsys.readouterr().out.strip())
    true = 300 - 15 + 1  # distinct canonical 15-mers of the genome
    assert abs(est - true) / true < 0.1


def test_read_filter(tmp_path):
    genome = random_dna(300, 2)
    good = [genome[i:i + 50] for i in range(0, 250, 5)]
    junk = [random_dna(50, 100 + i) for i in range(3)]  # unique kmers
    p = tmp_path / "reads.fa"
    p.write_text("".join(f">r{i}\n{r}\n"
                         for i, r in enumerate(good + junk)))
    out = str(tmp_path / "filtered.fa")
    rc = tools.main(["read-filter", str(p), "-k", "15",
                     "--min-coverage", "2", "-o", out])
    assert rc == 0
    from spades_for_blackbird_tpu.io import fastq
    _, kept = fastq.read_sequences(out)
    assert all(j not in kept for j in junk)
    assert good[10] in kept


def test_gsimplifier(reads_file, tmp_path):
    path, genome = reads_file
    gfa1 = str(tmp_path / "in.gfa")
    gfa2 = str(tmp_path / "out.gfa")
    assert tools.main(["gbuilder", path, "-k", "15", "--gfa", gfa1]) == 0
    rc = tools.main(["gsimplifier", gfa1, gfa2])
    assert rc == 0
    from spades_for_blackbird_tpu.io import gfa as gfa_io
    segs, _ = gfa_io.read_gfa(gfa2)
    seqs = {s for s, _ in segs.values()}
    assert genome in seqs or nd.rc(genome) in seqs


def test_unknown_tool():
    assert tools.main(["bogus"]) == 2


def test_edge_positions_tool(tmp_path):
    """EdgePositionHandler equivalent (edges_position_handler.hpp:22):
    reference positions recovered per edge as colinear ranges."""
    import numpy as np
    from spades_for_blackbird_tpu.graph import condense, positions
    from spades_for_blackbird_tpu.graph.graph import compact_graph, edge_mask
    from spades_for_blackbird_tpu.kmers import counter, extension
    from spades_for_blackbird_tpu.ops import dna

    K = 21
    rng = np.random.default_rng(41)
    genome = "".join(rng.choice(list("ACGT"), size=600))
    reads = [genome[i:i + 60] for i in range(0, 540, 2)]
    codes, lengths = dna.encode_reads(reads)
    kp1 = counter.count_kmers(codes, lengths, K + 1)
    vt = extension.build_vertex_table(kp1, K)
    g = condense.build_graph(kp1, vt, K)
    g, _ = compact_graph(g)
    pos = positions.fill_edge_positions(g, {"ref": genome})
    # a single-unitig graph: one edge (or its conjugate) covers the
    # whole reference in one colinear range
    assert pos, "no positions recovered"
    spans = [(r.seq_start, r.seq_end) for rs in pos.values() for r in rs]
    best = max(spans, key=lambda se: se[1] - se[0])
    assert best[0] == 0 and best[1] >= len(genome) - 2


def test_truseq_analysis_tool(tmp_path):
    """truseq-analysis (projects/truseq_analysis VariationDetection):
    a genome part identical to the read set maps as one consistent run
    (no events); a part with 600 bp the assembly doesn't contain
    reports a 'Deletion' variation at the junction — the reference's
    CompareToReference convention (consistent_mapping.cpp:210-211:
    l+r == |assembled| -> Deletion, i.e. the assembly is missing
    sequence the part carries)."""
    import numpy as np
    from spades_for_blackbird_tpu import tools

    rng = np.random.default_rng(17)
    genome = "".join(rng.choice(list("ACGT"), size=3000))
    reads = [genome[i:i + 120] for i in range(0, 3000 - 120, 7)]
    reads_fa = tmp_path / "reads.fa"
    reads_fa.write_text("".join(f">r{i}\n{s}\n"
                                for i, s in enumerate(reads)))
    insertion = "".join(rng.choice(list("ACGT"), size=600))
    variant = genome[:1500] + insertion + genome[1500:]
    parts_fa = tmp_path / "parts.fa"
    parts_fa.write_text(f">clean\n{genome}\n>variant\n{variant}\n")

    report = tmp_path / "analysis_report"
    rc = tools.main(["truseq-analysis", "--dataset", str(reads_fa),
                     "--genome", str(parts_fa), "-k", "55",
                     "-o", str(report)])
    assert rc == 0
    text = report.read_text()
    assert "Analysis of part clean" in text
    assert "Analysis of part variant" in text
    clean_sec, variant_sec = text.split("Analysis of part variant")
    assert "Breakpoint" not in clean_sec
    assert "Deletion" not in clean_sec
    import re
    m = re.search(r"Deletion \((\d+), (\d+)\): Length: (\d+)",
                  variant_sec)
    assert m, f"no Deletion event reported: {variant_sec!r}"
    a, bpos, ln = int(m.group(1)), int(m.group(2)), int(m.group(3))
    assert 1400 <= a <= 1600          # event starts at the junction
    assert 500 <= ln <= 700           # ~600 bp missing from assembly
