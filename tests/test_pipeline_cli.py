"""Multi-K pipeline + CLI + GFA output tests (the spades.py --test
equivalent, check_test_stage.py behavior)."""

import os
import subprocess
import sys

import numpy as np
import pytest

DATASET = "/root/reference/assembler/test_dataset"

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.isdir(DATASET), reason="toy dataset unavailable")]


def test_multi_k_closes_k55_gap():
    import naive_debruijn as nd
    from spades_for_blackbird_tpu.io import fastq
    from spades_for_blackbird_tpu.pipeline import assemble

    b1, b2 = fastq.load_paired_reads(
        f"{DATASET}/ecoli_1K_1.fq.gz", f"{DATASET}/ecoli_1K_2.fq.gz")
    batch = fastq.concat_batches([b1, b2])
    res = assemble.assemble_multi_k(batch.codes, batch.lengths, [21, 33, 55])
    _, seqs = fastq.read_sequences(f"{DATASET}/reference_1K.fa.gz")
    ref = seqs[0]
    assert len(res.contigs) == 1
    assert res.contigs[0][0] in (ref, nd.rc(ref))


def test_cli_end_to_end(tmp_path):
    import naive_debruijn as nd
    from spades_for_blackbird_tpu import cli
    from spades_for_blackbird_tpu.io import gfa
    out = tmp_path / "out"
    rc_code = cli.main(["--test", "-o", str(out), "-k", "21,33"])
    assert rc_code == 0
    contigs = (out / "contigs.fasta").read_text()
    assert contigs.startswith(">NODE_1_length_1000_cov_")
    gfa_text = (out / "assembly_graph_with_scaffolds.gfa").read_text()
    assert gfa_text.startswith("H\tVN:Z:1.0")
    assert "\nS\t1\t" in gfa_text
    assert (out / "spades.log").exists()

    # path records (contig_output_stage.cpp:105-112): P lines in the
    # GFA, contigs.paths/scaffolds.paths next to the fasta files, and
    # the paths must RECONSTRUCT the contig sequences
    segments, _, plines = gfa.read_gfa(
        str(out / "assembly_graph_with_scaffolds.gfa"), with_paths=True)
    assert plines, "no P records in assembly_graph_with_scaffolds.gfa"
    k = 33

    def seg_seq(tok):
        seq = segments[tok[:-1]][0]
        return seq if tok[-1] == "+" else nd.rc(seq)

    def reconstruct(toks):
        seq = seg_seq(toks[0])
        for tok in toks[1:]:
            seq += seg_seq(tok)[k:]
        return seq

    # fasta headers by name
    fa = {}
    name = None
    for line in contigs.splitlines():
        if line.startswith(">"):
            name = line[1:]
            fa[name] = ""
        else:
            fa[name] += line

    cpaths = (out / "contigs.paths").read_text().splitlines()
    assert cpaths[0] in fa            # name line matches a fasta header
    # parse: name, path-string (may span lines via ';' continuation)
    entries = {}
    i = 0
    while i < len(cpaths):
        nm = cpaths[i]
        i += 1
        toks_lines = []
        while i < len(cpaths) and not (cpaths[i].startswith("NODE_")):
            toks_lines.append(cpaths[i])
            i += 1
        entries[nm] = toks_lines
    for nm, seq in fa.items():
        assert nm in entries and nm + "'" in entries
        toks_lines = entries[nm]
        if len(toks_lines) == 1 and not toks_lines[0].endswith(";"):
            toks = toks_lines[0].split(",")
            assert reconstruct(toks) == seq, f"path of {nm} mismatch"
    assert (out / "scaffolds.paths").exists()


def test_cli_errors():
    from spades_for_blackbird_tpu import cli
    # no input
    assert cli.main(["-o", "/tmp/x_cli_err"]) == 2
    # mismatched -1/-2
    assert cli.main(["-1", "a.fq", "-o", "/tmp/x_cli_err"]) == 2


def test_gfa_roundtrip(tmp_path):
    import naive_debruijn as nd
    from spades_for_blackbird_tpu.graph import construct
    from spades_for_blackbird_tpu.io import gfa
    from spades_for_blackbird_tpu.ops import dna

    rng = np.random.default_rng(0)
    x = "".join(rng.choice(list("ACGT"), size=60))
    s1 = x + "".join(rng.choice(list("ACGT"), size=30))
    s2 = x + "".join(rng.choice(list("ACGT"), size=30))
    codes, lengths = dna.encode_reads([s1, s2])
    g = construct.graph_from_reads(codes, lengths, 15)

    path = tmp_path / "g.gfa"
    gfa.write_gfa(str(path), g)
    segments, links = gfa.read_gfa(str(path))
    # fork: 3 segments (stem, branch1, branch2), 2 links
    assert len(segments) == 3
    assert len(links) == 2
    seqs = {s for s, _ in segments.values()}
    # stem + the two branch edges (up to orientation)
    assert any(s1[:len(next(iter(seqs)))] for s in seqs)  # smoke
    for name, (seq, cov) in segments.items():
        assert cov > 0


def test_mate_pair_rf_library(tmp_path):
    """RF mate pairs (--mp-1/--mp-2) convert to FR and drive repeat
    resolution (library_fwd.hpp MatePairs orientation)."""
    import numpy as np
    import naive_debruijn as nd
    from spades_for_blackbird_tpu import cli

    rng = np.random.default_rng(31)
    A = "".join(rng.choice(list("ACGT"), size=150))
    R = "".join(rng.choice(list("ACGT"), size=80))
    B = "".join(rng.choice(list("ACGT"), size=150))
    C = "".join(rng.choice(list("ACGT"), size=150))
    genome = A + R + B + R + C
    L, IS = 50, 200
    positions = list(range(0, len(genome) - IS + 1, 3))
    if positions[-1] != len(genome) - IS:
        positions.append(len(genome) - IS)
    with open(tmp_path / "mp_1.fq", "w") as f1, \
            open(tmp_path / "mp_2.fq", "w") as f2:
        for i, pos in enumerate(positions):
            fr1 = genome[pos:pos + L]
            fr2 = nd.rc(genome[pos + IS - L:pos + IS])
            # convert the FR pair to RF by rc'ing both mates
            f1.write(f"@p{i}/1\n{nd.rc(fr1)}\n+\n{'I' * L}\n")
            f2.write(f"@p{i}/2\n{nd.rc(fr2)}\n+\n{'I' * L}\n")
    out = tmp_path / "out"
    rc_code = cli.main(["--mp-1", str(tmp_path / "mp_1.fq"),
                        "--mp-2", str(tmp_path / "mp_2.fq"),
                        "-o", str(out), "-k", "15", "--only-assembler"])
    assert rc_code == 0
    from spades_for_blackbird_tpu.io import fastq as fq
    _, contigs = fq.read_sequences(str(out / "contigs.fasta"))
    # RF pairs must behave exactly like the FR geometry: every contig
    # genomic, and the top path extended through at least one repeat copy
    # (longer than any single unitig; unitigs here are <= ~395bp)
    for s in contigs:
        assert s in genome or nd.rc(s) in genome
    assert len(contigs[0]) >= 420, len(contigs[0])
