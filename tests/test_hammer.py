"""BayesHammer-style read correction tests (projects/hammer equivalent)."""

import numpy as np
import pytest

import naive_debruijn as nd
from spades_for_blackbird_tpu.hammer import correct
from spades_for_blackbird_tpu.ops import dna


def random_dna(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def test_single_error_corrected():
    genome = random_dna(400, 1)
    reads = [genome[i:i + 60] for i in range(0, 340, 4)]
    # inject one error into one read copy
    bad = genome[100:160]
    wrong = "A" if bad[30] != "A" else "C"
    reads.append(bad[:30] + wrong + bad[31:])
    codes, lengths = dna.encode_reads(reads)
    corrected, stats = correct.correct_reads(codes, lengths, k=21)
    assert stats["changed_bases"] >= 1
    fixed = dna.decode_codes(corrected[-1][:60])
    assert fixed == bad, f"expected corrected read to match genome"
    # clean reads untouched
    for i in range(0, len(reads) - 1, 17):
        assert dna.decode_codes(corrected[i][:60]) == reads[i]


def test_error_free_reads_unchanged():
    genome = random_dna(300, 2)
    reads = [genome[i:i + 50] for i in range(0, 250, 5)]
    reads += [nd.rc(r) for r in reads[:10]]
    codes, lengths = dna.encode_reads(reads)
    corrected, stats = correct.correct_reads(codes, lengths, k=21)
    assert stats["changed_bases"] == 0
    assert (corrected == codes).all()


def test_high_error_read_mostly_fixed():
    genome = random_dna(400, 3)
    reads = [genome[i:i + 60] for i in range(0, 340, 3)]
    rng = np.random.default_rng(4)
    # several reads with one error each at random positions
    n_err = 0
    for j in range(10):
        pos = int(rng.integers(0, 340))
        r = genome[pos:pos + 60]
        p = int(rng.integers(5, 55))
        wrong = "ACGT"[("ACGT".index(r[p]) + 1) % 4]
        reads.append(r[:p] + wrong + r[p + 1:])
        n_err += 1
    codes, lengths = dna.encode_reads(reads)
    corrected, stats = correct.correct_reads(codes, lengths, k=21)
    # every corrected read must be a genome substring now
    nfixed = 0
    for i in range(len(reads) - 10, len(reads)):
        s = dna.decode_codes(corrected[i][:60])
        if s in genome:
            nfixed += 1
    assert nfixed >= 8, f"only {nfixed}/10 erroneous reads fixed"
