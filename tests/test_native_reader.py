"""Native (C++) FASTQ reader parity tests."""

import os

import numpy as np
import pytest

from spades_for_blackbird_tpu import native
from spades_for_blackbird_tpu.io import fastq
from spades_for_blackbird_tpu.ops import dna

DATASET = "/root/reference/assembler/test_dataset"


@pytest.mark.skipif(not os.path.isdir(DATASET), reason="dataset missing")
def test_native_matches_python_fastq():
    path = f"{DATASET}/ecoli_1K_2.fq.gz"
    out = native.load_reads_native(path)
    if out is None:
        pytest.skip("native toolchain unavailable")
    codes_n, lengths_n = out
    _, seqs = fastq.read_sequences(path)
    codes_p, lengths_p = dna.encode_reads(seqs)
    assert codes_n.shape == codes_p.shape
    assert (codes_n == codes_p).all()
    assert (lengths_n == lengths_p).all()


def test_native_plain_fastq_with_n(tmp_path):
    p = tmp_path / "t.fq"
    p.write_text("@r1\nACGTN\n+\nIIIII\n@r2\nTTT\n+\nIII\n")
    out = native.load_reads_native(str(p), with_quals=True)
    if out is None:
        pytest.skip("native toolchain unavailable")
    codes, lengths, quals = out
    assert codes.shape == (2, 5)
    assert list(codes[0]) == [0, 1, 2, 3, 4]
    assert list(codes[1]) == [3, 3, 3, 4, 4]
    assert list(lengths) == [5, 3]
    assert quals[0][0] == ord("I")


def test_native_multiline_fasta(tmp_path):
    p = tmp_path / "t.fa"
    p.write_text(">a\nACGT\nACGT\n>b desc\nGGGG\n")
    out = native.load_reads_native(str(p))
    if out is None:
        pytest.skip("native toolchain unavailable")
    codes, lengths = out
    assert list(lengths) == [8, 4]
    assert dna.decode_codes(codes[0][:8]) == "ACGTACGT"
    assert dna.decode_codes(codes[1][:4]) == "GGGG"
