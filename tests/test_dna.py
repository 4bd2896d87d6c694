"""Golden tests for 2-bit DNA primitives vs naive Python implementations.

Mirrors the reference's primitive unit tests
(assembler/src/test/include_test/seq_test.cpp, nucl_test.cpp).
"""

import numpy as np
import pytest

from spades_for_blackbird_tpu.ops import dna

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def rc_str(s: str) -> str:
    return "".join(COMP[c] for c in reversed(s))


def naive_pack(s: str, k: int) -> list[int]:
    W = dna.words_per_kmer(k)
    words = [0] * W
    for i, ch in enumerate(s):
        w, slot = divmod(i, dna.BASES_PER_WORD)
        code = "ACGT".index(ch)
        words[w] |= code << ((dna.BASES_PER_WORD - 1 - slot) * 2)
    return words


@pytest.mark.parametrize("s", ["ACGT", "A", "TTTTTTTTTTTTTTTT",
                               "ACGTACGTACGTACGTA",
                               "GATTACAGATTACAGATTACAGATTACAGATTACA"])
def test_encode_decode_roundtrip(s):
    codes = dna.encode_str(s)
    assert dna.decode_codes(codes) == s


def test_encode_invalid():
    codes = dna.encode_str("ANCX")
    assert list(codes) == [dna.A, dna.INVALID_CODE, dna.C, dna.INVALID_CODE]


@pytest.mark.parametrize("k", [4, 15, 16, 17, 21, 31, 32, 33, 55, 77, 127])
def test_pack_unpack_revcomp(k):
    rng = np.random.default_rng(k)
    for _ in range(5):
        s = "".join(rng.choice(list("ACGT"), size=k))
        codes = dna.encode_str(s)[None, :]
        packed = dna.pack_kmers(codes, k)
        assert [int(w) for w in np.asarray(packed)[0]] == naive_pack(s, k)
        assert dna.decode_codes(np.asarray(dna.unpack_kmers(packed, k))[0]) == s
        rc = dna.revcomp_kmers(packed, k)
        assert dna.decode_codes(np.asarray(dna.unpack_kmers(rc, k))[0]) == rc_str(s)


@pytest.mark.parametrize("k", [5, 16, 21, 33])
def test_canonicalize(k):
    rng = np.random.default_rng(k)
    seqs = ["".join(rng.choice(list("ACGT"), size=k)) for _ in range(20)]
    codes = np.stack([dna.encode_str(s) for s in seqs])
    packed = dna.pack_kmers(codes, k)
    canon, is_fwd = dna.canonicalize_kmers(packed, k)
    for i, s in enumerate(seqs):
        expect = min(s, rc_str(s))
        got = dna.decode_codes(np.asarray(dna.unpack_kmers(canon[i:i+1], k))[0])
        assert got == expect
        assert bool(is_fwd[i]) == (s <= rc_str(s))


@pytest.mark.parametrize("k", [5, 16, 21])
def test_first_last_base(k):
    rng = np.random.default_rng(100 + k)
    seqs = ["".join(rng.choice(list("ACGT"), size=k)) for _ in range(10)]
    codes = np.stack([dna.encode_str(s) for s in seqs])
    packed = dna.pack_kmers(codes, k)
    first = np.asarray(dna.kmer_first_base(packed, k))
    last = np.asarray(dna.kmer_last_base(packed, k))
    for i, s in enumerate(seqs):
        assert first[i] == "ACGT".index(s[0])
        assert last[i] == "ACGT".index(s[-1])


def test_kmer_less_matches_string_order():
    k = 21
    rng = np.random.default_rng(7)
    seqs = ["".join(rng.choice(list("ACGT"), size=k)) for _ in range(30)]
    codes = np.stack([dna.encode_str(s) for s in seqs])
    packed = dna.pack_kmers(codes, k)
    a, b = packed[:15], packed[15:]
    lt = np.asarray(dna.kmer_less(a, b))
    for i in range(15):
        assert bool(lt[i]) == (seqs[i] < seqs[15 + i])
