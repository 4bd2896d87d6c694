"""K-mer extraction + counting vs naive Python counters.

Mirrors the counting behavior exercised by the reference's construction
stage (assembler/src/common/stages/construction.cpp:218-247).
"""

import collections

import numpy as np
import pytest

from spades_for_blackbird_tpu.ops import dna, kmer
from spades_for_blackbird_tpu.kmers import counter

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def rc_str(s):
    return "".join(COMP[c] for c in reversed(s))


def naive_canonical_counts(seqs, k):
    counts = collections.Counter()
    for s in seqs:
        for i in range(len(s) - k + 1):
            km = s[i:i + k]
            if set(km) - set("ACGT"):
                continue
            counts[min(km, rc_str(km))] += 1
    return counts


def make_batch(seqs):
    codes, lengths = dna.encode_reads(seqs)
    return codes, lengths


@pytest.mark.parametrize("k", [4, 15, 16, 17, 21, 33])
def test_extract_kmers_matches_naive(k):
    rng = np.random.default_rng(k)
    seqs = []
    for n in [k, k + 1, k + 7, 60]:
        s = "".join(rng.choice(list("ACGTN"), size=n, p=[.24, .24, .24, .24, .04]))
        seqs.append(s)
    codes, lengths = make_batch(seqs)
    kmers, valid = kmer.extract_kmers(codes, lengths, k)
    kmers, valid = np.asarray(kmers), np.asarray(valid)
    for r, s in enumerate(seqs):
        for p in range(codes.shape[1] - k + 1):
            window = s[p:p + k] if p + k <= len(s) else None
            ok = window is not None and not (set(window) - set("ACGT"))
            assert bool(valid[r, p]) == ok, (r, p, window)
            if ok:
                got = dna.decode_codes(
                    np.asarray(dna.unpack_kmers(kmers[r, p][None], k))[0])
                assert got == window


@pytest.mark.parametrize("k", [5, 17, 21, 33, 55])
def test_count_kmers_matches_naive(k):
    rng = np.random.default_rng(k * 3)
    seqs = ["".join(rng.choice(list("ACGT"), size=80)) for _ in range(20)]
    # duplicate some reads to get interesting counts
    seqs += seqs[:5]
    codes, lengths = make_batch(seqs)
    table = counter.count_kmers(codes, lengths, k)
    expect = naive_canonical_counts(seqs, k)

    num = int(table.num)
    assert num == len(expect)
    got = {}
    uk = np.asarray(dna.unpack_kmers(table.kmers[:num], k))
    cnts = np.asarray(table.counts[:num])
    for i in range(num):
        got[dna.decode_codes(uk[i])] = int(cnts[i])
    assert got == dict(expect)
    # sorted order
    keys = [dna.decode_codes(uk[i]) for i in range(num)]
    assert keys == sorted(keys)


def test_filter_min_count():
    k = 21
    rng = np.random.default_rng(9)
    seqs = ["".join(rng.choice(list("ACGT"), size=50)) for _ in range(10)]
    seqs += seqs[:3] * 2  # some reads seen 3x
    codes, lengths = make_batch(seqs)
    table = counter.count_kmers(codes, lengths, k)
    filtered = counter.filter_min_count(table, 3)
    expect = {km: c for km, c in naive_canonical_counts(seqs, k).items() if c >= 3}
    num = int(filtered.num)
    assert num == len(expect)
    uk = np.asarray(dna.unpack_kmers(filtered.kmers[:num], k))
    for i in range(num):
        assert expect[dna.decode_codes(uk[i])] == int(filtered.counts[i])


def test_lookup():
    k = 21
    rng = np.random.default_rng(11)
    seqs = ["".join(rng.choice(list("ACGT"), size=60)) for _ in range(10)]
    codes, lengths = make_batch(seqs)
    table = counter.count_kmers(codes, lengths, k)
    num = int(table.num)
    # all table kmers must be found at their own index
    idx, found = counter.lookup(table, table.kmers)
    assert np.asarray(found)[:num].all()
    assert (np.asarray(idx)[:num] == np.arange(num)).all()
    # random absent kmers (query not canonicalized on purpose: a canonical
    # table must still answer for canonical queries only)
    probe_seqs = ["".join(rng.choice(list("ACGT"), size=k)) for _ in range(50)]
    pc, pl = make_batch(probe_seqs)
    pk, _ = kmer.extract_kmers(pc, pl, k)
    canon, _ = dna.canonicalize_kmers(pk[:, 0], k)
    idx, found = counter.lookup(table, canon)
    expect = naive_canonical_counts(seqs, k)
    for i, s in enumerate(probe_seqs):
        want = min(s, rc_str(s)) in expect
        assert bool(np.asarray(found)[i]) == want


def test_searchsorted_rows_pow2_haystack():
    """Regression: with a power-of-two row count — every pow2-trimmed
    table — the binary search ran (N-1).bit_length() halvings, one
    short of convergence, and reported present needles absent whenever
    their index landed at the unresolved hi bound."""
    import jax.numpy as jnp
    from spades_for_blackbird_tpu.ops import segments

    rng = np.random.default_rng(5)
    for N in (8, 64, 1024):
        rows = np.unique(
            rng.integers(0, 2**32, (N, 2), dtype=np.uint32), axis=0)
        n = rows.shape[0]
        pad = np.full((N - n, 2), 0xFFFFFFFF, np.uint32)
        hay = jnp.asarray(np.concatenate([rows, pad]))
        idx = np.asarray(segments.searchsorted_rows(hay, hay[:n]))
        np.testing.assert_array_equal(idx, np.arange(n))
        # absent needles report N
        absent = jnp.asarray(
            np.array([[1, 1]], np.uint32) ^ rows[:1])  # differs from row0
        got = int(segments.searchsorted_rows(hay, absent)[0])
        in_table = (rows == np.asarray(absent)[0]).all(axis=1).any()
        assert in_table or got == N
