"""biosyntheticSPAdes subsystem: translation, profile-HMM Viterbi,
HMMER3 file round-trip, domain extraction, restricted-edge protection,
and the --bio CLI flow."""

import numpy as np
import pytest
import jax.numpy as jnp

import naive_debruijn as nd
from spades_for_blackbird_tpu.graph import construct
from spades_for_blackbird_tpu.io import hmmfile
from spades_for_blackbird_tpu.models import bio
from spades_for_blackbird_tpu.ops import aa, dna, hmm
from spades_for_blackbird_tpu.simplify import passes

K = 15
MOTIF = "MAGICHEMISTRYWKDNVFQ"


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def tile(s, L=60, step=5):
    r = [s[i:i + L] for i in range(0, len(s) - L + 1, step)]
    r.append(s[len(s) - L:])
    return r


def reverse_translate(aaseq: str) -> str:
    codon_of = {}
    for codon, a in aa._CODON_TABLE_STR.items():
        codon_of.setdefault(a, codon)
    return "".join(codon_of[c] for c in aaseq)


def test_translation_frames():
    assert aa.translate_str("ATGGCC") == "MA"
    assert aa.translate_str("TATGGCC", frame=1) == "MA"
    assert aa.translate_str("TAA") == "*"
    dna_motif = reverse_translate(MOTIF)
    assert aa.translate_str(dna_motif) == MOTIF


def test_viterbi_motif_and_envelope():
    prof = hmm.hmm_from_consensus("m", aa.encode_aa(MOTIF))
    rng = np.random.default_rng(1)
    seq = np.concatenate([rng.integers(0, 20, 40).astype(np.uint8),
                          aa.encode_aa(MOTIF),
                          rng.integers(0, 20, 30).astype(np.uint8)])
    seqs = seq[None, :]
    es, st = hmm.score_batch(prof, seqs, np.array([len(seq)], np.int32))
    hits = hmm.find_hits(es[0], st[0], len(seq), threshold=15.0,
                         min_span=10)
    assert len(hits) == 1
    a, b, s = hits[0]
    assert (a, b) == (40, 40 + len(MOTIF) - 1)


def test_viterbi_tolerates_substitution_and_insert():
    prof = hmm.hmm_from_consensus("m", aa.encode_aa(MOTIF))
    mutated = aa.encode_aa(MOTIF).copy()
    mutated[5] = (mutated[5] + 3) % 20          # substitution
    with_ins = np.concatenate([mutated[:10], [7], mutated[10:]])  # insert
    seqs = np.full((1, 40), 0, np.uint8)
    seqs[0, 5:5 + len(with_ins)] = with_ins
    es, st = hmm.score_batch(prof, seqs, np.array([40], np.int32))
    hits = hmm.find_hits(es[0], st[0], 40, threshold=10.0, min_span=10)
    assert len(hits) == 1


def test_hmmfile_roundtrip(tmp_path):
    prof = hmm.hmm_from_consensus("testmodel", aa.encode_aa(MOTIF))
    p = str(tmp_path / "test.hmm")
    hmmfile.write_hmm_file(p, [prof])
    back = hmmfile.read_hmm_file(p)
    assert len(back) == 1 and back[0].name == "testmodel"
    assert back[0].length == len(MOTIF)
    np.testing.assert_allclose(back[0].match[:, :20], prof.match[:, :20],
                               atol=1e-3)
    np.testing.assert_allclose(back[0].tMM, prof.tMM, atol=1e-3)
    # scores agree
    seq = aa.encode_aa(MOTIF)[None, :]
    e1, _ = hmm.score_batch(prof, seq, np.array([len(MOTIF)], np.int32))
    e2, _ = hmm.score_batch(back[0], seq, np.array([len(MOTIF)], np.int32))
    np.testing.assert_allclose(e1, e2, atol=1e-2)


def test_extract_domains_both_strands():
    dna_motif = reverse_translate(MOTIF)
    contig_fwd = random_dna(90, 2) + dna_motif + random_dna(60, 3)
    contig_rev = random_dna(45, 4) + nd.rc(dna_motif) + random_dna(75, 5)
    prof = hmm.hmm_from_consensus("mot", aa.encode_aa(MOTIF))
    hits = bio.extract_domains([contig_fwd, contig_rev], [prof],
                               score_threshold=15.0)
    by_contig = {}
    for h in hits:
        by_contig.setdefault(h.contig, []).append(h)
    assert 0 in by_contig and 1 in by_contig
    h0 = max(by_contig[0], key=lambda h: h.score)
    assert h0.strand == 1
    assert h0.nt_start == 90 and h0.nt_end == 90 + len(dna_motif)
    assert h0.seq == dna_motif
    h1 = max(by_contig[1], key=lambda h: h.score)
    assert h1.strand == -1
    assert h1.seq == nd.rc(dna_motif)


def test_restricted_edges_protect_bulges():
    # bulge: stem -> {strong variant, weak variant} -> stem; weak variant
    # restricted => bulge remover must keep it
    pre = random_dna(100, 6)
    post = random_dna(100, 7)
    mid_a = random_dna(30, 8)
    mid_b = mid_a[:15] + ("A" if mid_a[15] != "A" else "C") + mid_a[16:]
    reads = tile(pre + mid_a + post) * 6 + tile(pre + mid_b + post) * 2
    codes, lengths = dna.encode_reads(reads)
    g = construct.graph_from_reads(codes, lengths, K)
    v_space = 4 * g.capacity
    restricted_seq = pre[-20:] + mid_b + post[:20]

    mask = bio.fill_restricted_edges(g, [restricted_seq])
    assert mask.sum() >= 2  # weak variant + conjugate (and stems)

    before = int(np.asarray(passes.edge_mask(g)).sum())
    g_prot = passes.remove_bulges(g, v_space, jnp.int32(3 * K),
                                  jnp.float32(0.1), jnp.float32(1000.0),
                                  protected=jnp.asarray(mask))
    after_prot = int(np.asarray(passes.edge_mask(g_prot)).sum())
    g_free = passes.remove_bulges(g, v_space, jnp.int32(3 * K),
                                  jnp.float32(0.1), jnp.float32(1000.0))
    after_free = int(np.asarray(passes.edge_mask(g_free)).sum())
    assert after_free < before          # without protection, bulge glued
    assert after_prot == before         # with protection, kept


def test_bgc_chain_and_outputs(tmp_path):
    dna_m = reverse_translate(MOTIF)
    contig = (random_dna(60, 9) + dna_m + random_dna(120, 10) +
              dna_m + random_dna(60, 11))
    prof = hmm.hmm_from_consensus("mot", aa.encode_aa(MOTIF))
    hits = bio.extract_domains([contig], [prof], score_threshold=15.0,
                               output_dir=str(tmp_path))
    assert (tmp_path / "temp_anti" / "restricted_edges.fasta").exists()
    fwd_hits = [h for h in hits if h.strand == 1]
    assert len(fwd_hits) == 2
    arcs = bio.build_domain_graph(hits, max_gap=500)
    assert arcs
    chains = bio.bgc_candidates(hits, arcs)
    n = bio.write_bgc_outputs(str(tmp_path), [contig], hits, chains,
                              min_domains=2)
    assert n >= 1
    fa = (tmp_path / "gene_clusters.fasta").read_text()
    assert "cluster_1" in fa and dna_m in fa
    assert (tmp_path / "domain_graph.dot").read_text().count("->") >= 1


def test_bio_cli_e2e(tmp_path):
    from spades_for_blackbird_tpu import cli
    dna_m = reverse_translate(MOTIF)
    genome = random_dna(150, 12) + dna_m + random_dna(150, 13)
    reads = tile(genome) * 3
    reads_p = tmp_path / "reads.fa"
    reads_p.write_text("".join(
        f">r{i}\n{r}\n" for i, r in enumerate(reads)))
    prof = hmm.hmm_from_consensus("mot", aa.encode_aa(MOTIF))
    hmm_p = str(tmp_path / "models.hmm")
    hmmfile.write_hmm_file(hmm_p, [prof])
    out = tmp_path / "out"
    rc = cli.main(["-s", str(reads_p), "-o", str(out), "--bio",
                   "--custom-hmms", hmm_p, "--only-assembler",
                   "-k", "21"])
    assert rc == 0
    log = (out / "spades.log").read_text()
    assert "extracted" in log and "domain graph" in log
    assert (out / "gene_clusters.fasta").exists()
    assert dna_m in (out / "gene_clusters.fasta").read_text() or \
        nd.rc(dna_m) in (out / "gene_clusters.fasta").read_text()
