"""Quality-aware BayesHammer: quality-mass counting + qual plumbing."""

import gzip

import numpy as np
import jax.numpy as jnp

import naive_debruijn as nd
from spades_for_blackbird_tpu.hammer import correct as hammer
from spades_for_blackbird_tpu.io import fastq
from spades_for_blackbird_tpu.kmers import counter
from spades_for_blackbird_tpu.ops import dna

K = 15


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def test_quality_mass_discounts_low_quality():
    genome = random_dna(120, 1)
    reads = [genome[i:i + 50] for i in range(0, 70, 2)] * 2
    codes, lengths = dna.encode_reads(reads)
    R, L = codes.shape
    hi = np.full((R, L), ord("I"), np.uint8)       # phred 40
    lo = np.full((R, L), ord("#"), np.uint8)       # phred 2
    t_hi, w_hi = counter.count_kmers_quality(
        jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(hi), K)
    t_lo, w_lo = counter.count_kmers_quality(
        jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(lo), K)
    n = int(t_hi.num)
    assert n == int(t_lo.num)
    w_hi = np.asarray(w_hi)[:n]
    w_lo = np.asarray(w_lo)[:n]
    c = np.asarray(t_hi.counts)[:n].astype(np.float64)
    # phred 40: weight ~= count; phred 2: strongly discounted
    assert np.allclose(w_hi, c, rtol=0.01)
    assert (w_lo < 0.02 * c).all()


def test_quality_guides_correction():
    # an error supported by LOW-quality bases gets corrected even when
    # its raw k-mer count alone would make it look solid
    genome = random_dna(200, 2)
    good = [genome[i:i + 60] for i in range(0, 140, 2)]   # 70 clean reads
    bad_read = list(genome[50:110])
    bad_read[30] = "A" if bad_read[30] != "A" else "C"
    bad = ["".join(bad_read)] * 8                          # repeated error
    reads = good + bad
    codes, lengths = dna.encode_reads(reads)
    R, L = codes.shape
    quals = np.full((R, L), ord("I"), np.uint8)
    # the erroneous base column is low-quality in the bad reads
    for i in range(len(good), R):
        quals[i, 25:35] = ord("#")

    fixed_q, stats_q = hammer.correct_reads(codes, lengths, k=K,
                                            quals=quals)
    bad_rows = fixed_q[len(good):]
    want = dna.encode_reads([genome[50:110]])[0][0]
    n_fixed = sum((bad_rows[i][:60] == want[:60]).all()
                  for i in range(len(bad)))
    assert n_fixed == len(bad), stats_q


def test_fastq_qual_loading(tmp_path):
    reads = [random_dna(40, s) for s in range(5)]
    p = str(tmp_path / "r.fastq.gz")
    with gzip.open(p, "wt") as f:
        for i, r in enumerate(reads):
            q = chr(33 + (i + 2)) * len(r)
            f.write(f"@r{i}\n{r}\n+\n{q}\n")
    b = fastq.load_reads(p, with_quals=True)
    assert b.quals is not None and b.quals.shape == b.codes.shape
    for i in range(5):
        assert (b.quals[i, :40] == 33 + i + 2).all()
    # concat keeps quals; fasta batch (no quals) poisons to None
    b2 = fastq.concat_batches([b, b])
    assert b2.quals is not None and b2.quals.shape[0] == 10
    fa = tmp_path / "r.fasta"
    fa.write_text("".join(f">s{i}\n{r}\n" for i, r in enumerate(reads)))
    b3 = fastq.load_reads(str(fa), with_quals=True)
    assert b3.quals is None
    assert fastq.concat_batches([b, b3]).quals is None
