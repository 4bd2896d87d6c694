"""truSPAdes per-barcode driver + webvis HTML export."""

import json

import numpy as np

import naive_debruijn as nd
from spades_for_blackbird_tpu.ops import dna

K = 15


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def tile(s, L=50, step=5):
    r = [s[i:i + L] for i in range(0, len(s) - L + 1, step)]
    r.append(s[len(s) - L:])
    return r


def test_truspades_barcodes(tmp_path):
    from spades_for_blackbird_tpu import tools
    g1 = random_dna(300, 1)
    g2 = random_dna(300, 2)
    bdir = tmp_path / "barcodes"
    bdir.mkdir()
    (bdir / "BC01.fasta").write_text("".join(
        f">r{i}\n{r}\n" for i, r in enumerate(tile(g1))))
    (bdir / "BC02.fasta").write_text("".join(
        f">r{i}\n{r}\n" for i, r in enumerate(tile(g2))))
    out = tmp_path / "out"
    rc = tools.main(["truspades", "--input-dir", str(bdir),
                     "-o", str(out), "-k", str(K)])
    assert rc == 0
    tslr = (out / "TSLR.fasta").read_text()
    assert ">BC01_" in tslr and ">BC02_" in tslr
    seqs = [l for l in tslr.splitlines() if not l.startswith(">")]
    assert any(s in (g1, nd.rc(g1)) for s in seqs)
    assert any(s in (g2, nd.rc(g2)) for s in seqs)


def test_webvis_html(tmp_path):
    from spades_for_blackbird_tpu.graph import construct
    from spades_for_blackbird_tpu.io.webvis import write_webvis_html
    genome = random_dna(250, 3)
    codes, lengths = dna.encode_reads(tile(genome))
    g = construct.graph_from_reads(codes, lengths, K)
    p = str(tmp_path / "g.html")
    write_webvis_html(p, g)
    body = open(p).read()
    assert body.startswith("<!DOCTYPE html>")
    assert "const GRAPH = {" in body
    # embedded JSON parses and matches the graph_json schema
    start = body.index("const GRAPH = ") + len("const GRAPH = ")
    end = body.index(";\n", start)
    doc = json.loads(body[start:end])
    assert doc["k"] == K and len(doc["links"]) == 1
