"""Long-read alignment + hybrid gap closing tests
(modules/alignment/pacbio GAligner + hybrid_aligning.cpp equivalents)."""

import numpy as np
import pytest

import naive_debruijn as nd
from spades_for_blackbird_tpu.graph import construct
from spades_for_blackbird_tpu.io.fasta import graph_contigs
from spades_for_blackbird_tpu.mapping import long_read
from spades_for_blackbird_tpu.ops import dna

K = 15


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def noisy(s, rate, seed):
    rng = np.random.default_rng(seed)
    out = []
    for ch in s:
        r = rng.random()
        if r < rate / 3:
            continue  # deletion
        if r < 2 * rate / 3:
            out.append("ACGT"[int(rng.integers(4))])  # substitution
            continue
        if r < rate:
            out.append(ch)
            out.append("ACGT"[int(rng.integers(4))])  # insertion
            continue
        out.append(ch)
    return "".join(out)


def tile(s, L=50, step=4):
    reads = [s[i:i + L] for i in range(0, len(s) - L + 1, step)]
    reads.append(s[len(s) - L:])
    return reads


def test_align_clean_long_read_single_edge():
    genome = random_dna(500, 1)
    codes, lengths = dna.encode_reads(tile(genome))
    g = construct.graph_from_reads(codes, lengths, K)
    lr = genome[50:450]
    lc, ll = dna.encode_reads([lr])
    als = long_read.align_long_reads(g, lc, ll)
    assert len(als) == 1 and len(als[0].chain) == 1
    h = als[0].chain[0]
    assert h.votes > 300
    assert h.edge_lo == pytest.approx(50, abs=5)


def test_align_noisy_long_read():
    genome = random_dna(600, 2)
    codes, lengths = dna.encode_reads(tile(genome))
    g = construct.graph_from_reads(codes, lengths, K)
    lr = noisy(genome[30:570], rate=0.10, seed=3)
    lc, ll = dna.encode_reads([lr])
    als = long_read.align_long_reads(g, lc, ll)
    assert len(als[0].chain) == 1
    assert als[0].chain[0].votes >= 10


def test_hybrid_gap_closing():
    genome = random_dna(900, 4)
    # short reads cover [0,400) and [500,900): 100bp sequencing hole
    reads = tile(genome[:400]) + tile(genome[500:])
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    pre = {s for s, _ in graph_contigs(g)}
    assert genome not in pre and nd.rc(genome) not in pre

    # noisy long reads spanning the hole
    lrs = [noisy(genome[250:750], 0.08, 10 + i) for i in range(4)]
    lc, ll = dna.encode_reads(lrs)
    g2, joined = long_read.hybrid_close_gaps(g, lc, ll)
    assert joined == 1
    post = graph_contigs(g2)
    top = post[0][0]
    # the fill comes from a noisy read: require full span + high identity
    assert len(top) == pytest.approx(900, rel=0.05)
    flank_l, flank_r = genome[:380], genome[520:]
    assert (flank_l in top and flank_r in top) or \
        (nd.rc(flank_l) in top and nd.rc(flank_r) in top)


def test_gmapper_tool(tmp_path):
    from spades_for_blackbird_tpu import tools
    from spades_for_blackbird_tpu.graph import construct as gconstruct
    from spades_for_blackbird_tpu.io import gfa as gfa_io

    genome = random_dna(400, 5)
    codes, lengths = dna.encode_reads(tile(genome))
    g = gconstruct.graph_from_reads(codes, lengths, K)
    gfa_path = str(tmp_path / "g.gfa")
    gfa_io.write_gfa(gfa_path, g)
    lr_path = tmp_path / "lr.fa"
    lr_path.write_text(f">lr0\n{noisy(genome[40:360], 0.08, 6)}\n")
    out = str(tmp_path / "al.tsv")
    rc = tools.main(["gmapper", gfa_path, str(lr_path), "-o", out])
    assert rc == 0
    lines = [l for l in open(out) if not l.startswith("#")]
    assert len(lines) == 1
    assert "\t" in lines[0]


def test_graph_path_fill_prefers_graph_bases():
    """gap_dijkstra.cpp equivalent: when a graph path spells the read's
    gap segment within the edit bound, the fill uses graph bases (the
    read's sequencing errors do not leak into the assembly)."""
    import numpy as np
    from spades_for_blackbird_tpu.graph import condense
    from spades_for_blackbird_tpu.graph.graph import compact_graph, edge_mask
    from spades_for_blackbird_tpu.kmers import counter, extension
    from spades_for_blackbird_tpu.mapping.long_read import _graph_path_fill
    from spades_for_blackbird_tpu.ops import dna

    K = 21
    rng = np.random.default_rng(31)
    a = "".join(rng.choice(list("ACGT"), size=300))
    m = "".join(rng.choice(list("ACGT"), size=150))
    b = "".join(rng.choice(list("ACGT"), size=300))
    flip = {"A": "C", "C": "G", "G": "T", "T": "A"}
    alt1 = a[-40:] + "".join(flip[c] for c in m[:20])
    alt2 = "".join(flip[c] for c in m[-20:]) + b[:40]
    genome = a + m + b
    reads = [genome[i:i + 60]
             for i in range(0, len(genome) - 60 + 1)] + [alt1, alt2] * 3
    codes, lengths = dna.encode_reads(reads)
    kp1 = counter.count_kmers(codes, lengths, K + 1)
    vt = extension.build_vertex_table(kp1, K)
    g = condense.build_graph(kp1, vt, K)
    g, _ = compact_graph(g)

    alive = np.asarray(edge_mask(g))
    sv = np.asarray(g.start_v)
    ev = np.asarray(g.end_v)
    ln = np.asarray(g.seq_len)
    starts = np.asarray(g.seq_start)
    flat = np.asarray(g.seq_flat)
    ids = [int(e) for e in np.nonzero(alive)[0]]
    triple = None
    for eA in ids:
        for eM in ids:
            if eM == eA or int(ev[eA]) != int(sv[eM]) or ln[eM] > 250 \
                    or ln[eM] < 100:
                continue
            for eB in ids:
                if eB not in (eA, eM) and int(ev[eM]) == int(sv[eB]):
                    triple = (eA, eM, eB)
                    break
            if triple:
                break
        if triple:
            break
    assert triple
    eA, eM, eB = triple
    truth = flat[starts[eM] + K: starts[eM] + ln[eM] - K].copy()
    noisy = truth.copy()
    noisy[5] = (noisy[5] + 1) % 4   # two long-read errors
    noisy[20] = (noisy[20] + 2) % 4
    fill = _graph_path_fill(g, eA, eB, noisy)
    assert fill is not None
    np.testing.assert_array_equal(fill, truth)


def test_gmapper_spaligner_formats(tmp_path):
    """spaligner output-format parity (MappingPrinterHub,
    mapping_printer.hpp:115-130): --output-dir writes alignment.tsv /
    alignment.gpa / alignment.fasta; GPA 'A' records carry a CIGAR
    whose D+M ops span the read block and I+M ops span the edge
    block (mapping_printer.cpp:195-229)."""
    import re
    from spades_for_blackbird_tpu import tools
    from spades_for_blackbird_tpu.graph import construct as gconstruct
    from spades_for_blackbird_tpu.io import gfa as gfa_io

    genome = random_dna(400, 5)
    codes, lengths = dna.encode_reads(tile(genome))
    g = gconstruct.graph_from_reads(codes, lengths, K)
    gfa_path = str(tmp_path / "g.gfa")
    gfa_io.write_gfa(gfa_path, g)
    lr_path = tmp_path / "lr.fa"
    lr_path.write_text(f">lr0\n{noisy(genome[40:360], 0.08, 6)}\n")
    outdir = tmp_path / "sp"
    rc = tools.main(["gmapper", gfa_path, str(lr_path),
                     "--output-dir", str(outdir),
                     "--output-format", "tsv,gpa,fasta"])
    assert rc == 0
    tsv = [l for l in (outdir / "alignment.tsv").read_text().splitlines()
           if not l.startswith("#")]
    assert len(tsv) == 1 and len(tsv[0].split("\t")) == 9
    fa = (outdir / "alignment.fasta").read_text()
    assert fa.startswith(">0|Edges=")
    gpa = (outdir / "alignment.gpa").read_text().splitlines()
    assert gpa[0] == "H"
    recs = [l.split("\t") for l in gpa[1:] if l]
    assert recs and all(r[0] == "A" for r in recs)
    for r in recs:
        start_r, len_r = int(r[3]), int(r[4])
        len_e = int(r[8])
        cig = r[10]
        ops = re.findall(r"(\d+)([MID])", cig)
        span_read = sum(int(n) for n, o in ops if o in "MD")
        span_edge = sum(int(n) for n, o in ops if o in "MI")
        assert span_read == len_r
        assert span_edge == len_e
    # prev/next linkage forms a chain
    names = [r[1] for r in recs]
    prevs = [r[11] for r in recs]
    nexts = [r[12] for r in recs]
    assert prevs[0] == "-" and nexts[-1] == "-"
    for i in range(1, len(recs)):
        assert prevs[i] == names[i - 1]
