"""online_vis REPL + truSPAdes scaffold correction + small tools
(unitig-coverage, cds-subgraphs, mag-improve, bin-converter)."""

import io

import numpy as np
import pytest

import naive_debruijn as nd
from spades_for_blackbird_tpu.ops import aa, dna, hmm

K = 15


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def tile(s, L=50, step=5):
    r = [s[i:i + L] for i in range(0, len(s) - L + 1, step)]
    r.append(s[len(s) - L:])
    return r


def write_reads(path, reads):
    path.write_text("".join(f">r{i}\n{r}\n" for i, r in enumerate(reads)))


def build_gfa(tmp_path, reads, k=K, name="g.gfa"):
    from spades_for_blackbird_tpu import tools
    rp = tmp_path / "reads_for_gfa.fa"
    write_reads(rp, reads)
    gfa_p = str(tmp_path / name)
    assert tools.main(["gbuilder", str(rp), "-k", str(k),
                       "--gfa", gfa_p]) == 0
    return gfa_p


def test_vis_repl(tmp_path, capsys):
    from spades_for_blackbird_tpu.vis import VisSession
    genome = random_dna(300, 1)
    gfa_p = build_gfa(tmp_path, tile(genome))
    dot_p = str(tmp_path / "n.dot")
    cmds = (f"load {gfa_p}\nstats\nedges 5\nedge 0\nseq 0 0 20\n"
            f"find {genome[50:70]}\nneigh 0 1\ndraw 0 1 {dot_p}\n"
            f"bogus\nquit\n")
    sess = VisSession()
    rc = sess.run(io.StringIO(cmds))
    assert rc == 0
    out = capsys.readouterr().out
    assert "loaded" in out and "edge 0" in out
    assert genome[:20] in out or nd.rc(genome)[:20] in out
    assert "offset" in out           # find located the substring
    assert "unknown command" in out  # bad input keeps the loop alive
    assert "digraph" in open(dot_p).read()


def test_scf_correction_fills_gap(tmp_path):
    from spades_for_blackbird_tpu import tools
    genome = random_dna(400, 2)
    gfa_p = build_gfa(tmp_path, tile(genome))
    scaffold = genome[:150] + "N" * 40 + genome[190:]
    scf_p = tmp_path / "scaffolds.fasta"
    scf_p.write_text(f">scf1\n{scaffold}\n")
    out_p = str(tmp_path / "corrected.fasta")
    assert tools.main(["scf-correction", gfa_p, str(scf_p),
                       "-o", out_p]) == 0
    body = "".join(l.strip() for l in open(out_p)
                   if not l.startswith(">"))
    assert body in (genome, nd.rc(genome))


def test_unitig_coverage(tmp_path):
    from spades_for_blackbird_tpu import tools
    genome = random_dna(300, 3)
    reads = tile(genome) * 4
    gfa_p = build_gfa(tmp_path, reads)
    rp = tmp_path / "reads.fa"
    write_reads(rp, reads)
    out_p = str(tmp_path / "cov.tsv")
    assert tools.main(["unitig-coverage", gfa_p, str(rp),
                       "-o", out_p]) == 0
    lines = open(out_p).read().strip().splitlines()
    assert len(lines) == 1
    name, n_reads, depth = lines[0].split("\t")
    assert int(n_reads) >= len(reads) * 0.9
    assert float(depth) > 20  # 4x tiling at step 5 ~ 40x
    # sanity: depth should be near naive read_bases / genome_len
    naive = sum(len(r) for r in reads) / len(genome)
    assert abs(float(depth) - naive) / naive < 0.25


def test_cds_subgraphs(tmp_path):
    from spades_for_blackbird_tpu import tools
    from spades_for_blackbird_tpu.io import hmmfile
    motif = "MAGICHEMISTRYWKDNVFQ"
    codon_of = {}
    for codon, a in aa._CODON_TABLE_STR.items():
        codon_of.setdefault(a, codon)
    dna_m = "".join(codon_of[c] for c in motif)
    genome = random_dna(120, 4) + dna_m + random_dna(120, 5)
    gfa_p = build_gfa(tmp_path, tile(genome))
    prof = hmm.hmm_from_consensus("mot", aa.encode_aa(motif))
    hmm_p = str(tmp_path / "m.hmm")
    hmmfile.write_hmm_file(hmm_p, [prof])
    prefix = str(tmp_path / "cds")
    assert tools.main(["cds-subgraphs", gfa_p, "--hmms", hmm_p,
                       "-o", prefix, "--threshold", "15"]) == 0
    cds = open(prefix + ".cds.fasta").read()
    assert dna_m in cds or nd.rc(dna_m) in cds
    assert "S\t" in open(prefix + ".subgraph.gfa").read()


def test_mag_improve(tmp_path):
    from spades_for_blackbird_tpu import tools
    stem = random_dna(200, 6)
    b1 = random_dna(120, 7)
    b2 = random_dna(120, 8)
    reads = tile(stem + b1) * 3 + tile(stem + b2) * 3
    gfa_p = build_gfa(tmp_path, reads)
    mag_p = tmp_path / "mag.fa"
    mag_p.write_text(f">m1\n{stem + b1}\n")
    out_p = str(tmp_path / "improved.fa")
    assert tools.main(["mag-improve", gfa_p, str(mag_p),
                       "-o", out_p]) == 0
    body = open(out_p).read()
    assert ">m1" in body
    assert "added_edge_" in body
    # the other branch's sequence is among the added edges
    assert b2[-60:] in body or nd.rc(b2)[:60] in body or \
        nd.rc(b2[-60:]) in body


def test_standalone_corrector(tmp_path):
    from spades_for_blackbird_tpu import tools
    genome = random_dna(400, 10)
    rp = tmp_path / "reads.fa"
    write_reads(rp, tile(genome, L=60, step=4))
    bad = list(genome)
    bad[100] = "A" if bad[100] != "A" else "C"
    bad[250] = "G" if bad[250] != "G" else "T"
    cp = tmp_path / "contigs.fa"
    cp.write_text(">c1\n" + "".join(bad) + "\n")
    op = str(tmp_path / "fixed.fa")
    assert tools.main(["corrector", str(cp), str(rp), "-o", op]) == 0
    fixed = "".join(l.strip() for l in open(op) if not l.startswith(">"))
    assert fixed == genome


def test_bin_converter(tmp_path):
    from spades_for_blackbird_tpu import cli, tools
    genome = random_dna(300, 9)
    rp = tmp_path / "reads.fa"
    write_reads(rp, tile(genome))
    out = tmp_path / "out"
    rc = cli.main(["-s", str(rp), "-o", str(out), "--only-assembler",
                   "-k", "15", "--checkpoints", "all"])
    assert rc == 0
    save = out / "saves" / "read_conversion"
    fq_p = str(tmp_path / "back.fastq.gz")
    assert tools.main(["bin-converter", str(save), "-o", fq_p]) == 0
    import gzip
    text = gzip.open(fq_p, "rt").read()
    assert text.count("@") >= len(tile(genome))
    assert tile(genome)[0] in text
