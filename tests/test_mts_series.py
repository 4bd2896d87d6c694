"""mts binning suite + SeriesAnalysis stage."""

import numpy as np
import pytest

import naive_debruijn as nd
from spades_for_blackbird_tpu.mts import abundance, binning
from spades_for_blackbird_tpu.ops import dna

K = 15


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def tile(s, L=50, step=5):
    r = [s[i:i + L] for i in range(0, len(s) - L + 1, step)]
    r.append(s[len(s) - L:])
    return r


def naive_canon_kmers(seqs, k):
    out = {}
    for s in seqs:
        for i in range(len(s) - k + 1):
            km = s[i:i + k]
            c = min(km, nd.rc(km))
            out[c] = out.get(c, 0) + 1
    return out


def test_multiplicity_profiles_two_samples():
    a = random_dna(200, 1)
    b = random_dna(200, 2)
    s1 = tile(a) * 2            # sample 1: genome a only
    s2 = tile(a) + tile(b) * 3  # sample 2: a (1x) + b (3x)
    batches = []
    for reads in (s1, s2):
        c, l = dna.encode_reads(reads)
        batches.append((c, l))
    kmers, mult = abundance.multiplicity_profiles(batches, K, min_mult=1)
    n1 = naive_canon_kmers(s1, K)
    n2 = naive_canon_kmers(s2, K)
    all_naive = set(n1) | set(n2)
    assert len(kmers) == len(all_naive)
    assert mult.sum() == sum(n1.values()) + sum(n2.values())
    # a k-mer unique to genome b must be 0 in sample 1
    only_b = [km for km in n2 if km not in n1]
    assert only_b
    # decode a profile row and cross-check one such k-mer
    from spades_for_blackbird_tpu.ops import dna as dna_ops
    import jax.numpy as jnp
    decoded = {}
    unpacked = np.asarray(dna_ops.unpack_kmers(jnp.asarray(kmers), K))
    for i in range(len(kmers)):
        decoded[dna_ops.decode_codes(unpacked[i])] = i
    row = mult[decoded[only_b[0]]]
    assert row[0] == 0 and row[1] == n2[only_b[0]]


def test_contig_abundance_tracks_depth():
    a = random_dna(300, 3)
    s1 = tile(a) * 4
    s2 = tile(a) * 1
    batches = [dna.encode_reads(s1), dna.encode_reads(s2)]
    kmers, mult = abundance.multiplicity_profiles(batches, K)
    prof = abundance.contig_abundance([a], kmers, mult, K)
    assert prof.shape == (1, 2)
    assert prof[0, 0] > 2.5 * prof[0, 1]
    frag = abundance.fragment_abundance(a, kmers, mult, K, frag_size=100)
    assert frag.shape[0] == 3 and frag.shape[1] == 2


def test_prop_binning_and_read_binning(tmp_path):
    from spades_for_blackbird_tpu import tools
    a = random_dna(400, 4)
    b = random_dna(400, 5)
    reads = tile(a) * 3 + tile(b) * 3
    reads_p = tmp_path / "reads.fa"
    reads_p.write_text("".join(
        f">r{i}\n{r}\n" for i, r in enumerate(reads)))
    gfa_p = str(tmp_path / "g.gfa")
    assert tools.main(["gbuilder", str(reads_p), "-k", str(K),
                       "--gfa", gfa_p]) == 0
    # annotate segments by content
    from spades_for_blackbird_tpu.graph.from_gfa import graph_from_gfa
    from spades_for_blackbird_tpu.graph.graph import edge_codes_host
    g, names = graph_from_gfa(gfa_p, return_names=True)
    ann = {}
    for e, name in names.items():
        s = dna.decode_codes(edge_codes_host(g, e))
        ann[name] = "BIN_A" if s in (a, nd.rc(a)) else "BIN_B"
    ann_p = tmp_path / "binning.ann"
    binning.write_annotation(str(ann_p), ann)
    out_p = str(tmp_path / "propagated.ann")
    assert tools.main(["prop-binning", gfa_p, str(ann_p),
                       "-o", out_p]) == 0
    back = binning.read_annotation(out_p)
    assert set(back.values()) == {"BIN_A", "BIN_B"}
    # read binning splits the read set by genome
    codes, lengths = dna.encode_reads(reads)
    edge_bins = {e: ann[n] for e, n in names.items()}
    labels = binning.propagate_bins(g, edge_bins)
    per_bin = binning.bin_reads(g, labels, codes, lengths)
    assert len(per_bin["BIN_A"]) >= len(tile(a)) * 2
    assert len(per_bin["BIN_B"]) >= len(tile(b)) * 2
    assert (per_bin["BIN_A"] < len(tile(a)) * 3).all()
    assert (per_bin["BIN_B"] >= len(tile(a)) * 3).all()


def test_series_analysis_cli(tmp_path):
    from spades_for_blackbird_tpu import cli, tools
    genome = random_dna(500, 6)
    reads = tile(genome) * 3
    reads_p = tmp_path / "reads.fa"
    reads_p.write_text("".join(
        f">r{i}\n{r}\n" for i, r in enumerate(reads)))
    # two "samples" at different depths
    s2_p = tmp_path / "s2.fa"
    s2_p.write_text("".join(
        f">r{i}\n{r}\n" for i, r in enumerate(tile(genome))))
    prof_p = str(tmp_path / "prof.npz")
    assert tools.main(["kmer-multiplicity-counter", str(reads_p),
                       str(s2_p), "-k", "21", "-o", prof_p,
                       "--min-mult", "1"]) == 0
    yaml_p = tmp_path / "series.yaml"
    yaml_p.write_text(
        f"k: 21\nsample_cnt: 2\nkmer_mult: {prof_p}\n"
        f"bin: BIN_A\nbin_prof: {tmp_path}/bins.prof\nmin_len: 0\n"
        f"edges_sqn: {tmp_path}/edges.fasta\n"
        f"edges_mpl: {tmp_path}/edges.mpl\n"
        f"edge_fragments_mpl: {tmp_path}/frags.mpl\nfrag_size: 100\n")
    out = tmp_path / "out"
    rc = cli.main(["-s", str(reads_p), "-o", str(out), "--only-assembler",
                   "-k", "21", "--series-analysis", str(yaml_p)])
    assert rc == 0
    assert (tmp_path / "edges.fasta").read_text().startswith(">EDGE_1")
    mpl = (tmp_path / "edges.mpl").read_text().strip().splitlines()
    assert len(mpl) >= 1 and len(mpl[0].split("\t")) == 3
    v1, v2 = float(mpl[0].split("\t")[1]), float(mpl[0].split("\t")[2])
    assert v1 > 1.5 * v2  # sample 1 is 3x deeper
    assert (tmp_path / "frags.mpl").exists()


def test_contig_abundance_tool(tmp_path):
    from spades_for_blackbird_tpu import tools
    genome = random_dna(300, 7)
    reads_p = tmp_path / "s1.fa"
    reads_p.write_text("".join(
        f">r{i}\n{r}\n" for i, r in enumerate(tile(genome) * 2)))
    prof_p = str(tmp_path / "p.npz")
    assert tools.main(["kmer-multiplicity-counter", str(reads_p),
                       "-k", "15", "-o", prof_p, "--min-mult", "1"]) == 0
    contigs_p = tmp_path / "c.fa"
    contigs_p.write_text(f">c1\n{genome}\n")
    out_p = str(tmp_path / "abund.tsv")
    assert tools.main(["contig-abundance", str(contigs_p), prof_p,
                       "-o", out_p]) == 0
    line = open(out_p).read().strip()
    assert line.startswith("c1\t") and float(line.split("\t")[1]) >= 2.0
