"""BayesHammer statistical-core tests (kmer_cluster.cpp Bayesian
subclustering + expander.cpp solid-set expansion): on quality-skewed
error reads the Bayesian pipeline must measurably beat the count-based
center-ratio heuristic in corrected-base precision/recall.
"""

import numpy as np
import pytest


def make_dataset(seed=7, glen=2000, L=60, step=2, err_rate=0.5):
    from spades_for_blackbird_tpu.ops import dna
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), size=glen))
    reads, quals, planted = [], [], 0
    for pos in range(0, glen - L + 1, step):
        s = list(genome[pos:pos + L])
        q = np.full(L, 38, np.int64)
        lowq = rng.choice(L, size=3, replace=False)
        for i in lowq:
            q[i] = rng.integers(2, 12)
            if rng.random() < err_rate:
                s[i] = rng.choice([c for c in "ACGT" if c != s[i]])
                planted += 1
        reads.append("".join(s))
        quals.append(q + 33)
    codes, lengths = dna.encode_reads(reads)
    qarr = np.zeros(codes.shape, np.uint8)
    for i, q in enumerate(quals):
        qarr[i, :L] = q
    truth, _ = dna.encode_reads(
        [genome[p:p + L] for p in range(0, glen - L + 1, step)])
    return codes, lengths, qarr, np.asarray(truth), planted


def score(codes, truth, out):
    wrong = codes != truth
    fixed = int((wrong & (out == truth)).sum())
    broke = int((~wrong & (out != truth)).sum())
    return fixed, broke, int(wrong.sum())


def test_bayes_beats_center_ratio_heuristic():
    from spades_for_blackbird_tpu.hammer import correct
    codes, lengths, qarr, truth, planted = make_dataset()
    out_b, st_b = correct.correct_reads(
        codes, lengths, k=21, quals=qarr, bayes=True)
    out_h, st_h = correct.correct_reads(
        codes, lengths, k=21, quals=qarr, bayes=False)
    fixed_b, broke_b, wrong = score(codes, truth, out_b)
    fixed_h, broke_h, _ = score(codes, truth, out_h)
    assert st_b["mode"] == "bayes"
    # recall: the Bayesian model must recover the clear majority of
    # planted errors and beat the heuristic by a wide margin
    assert fixed_b / wrong > 0.9, (fixed_b, wrong)
    assert fixed_b > fixed_h * 1.5, (fixed_b, fixed_h)
    # precision: (almost) no correct bases may be corrupted
    assert broke_b <= wrong // 100, broke_b


def test_subclustering_separates_two_genomic_centers():
    """A Hamming cluster holding TWO genomic k-mers linked by an error
    chain must yield two solid centers (the center-ratio heuristic
    marks the lower-count one as an error when counts differ 10x)."""
    import jax.numpy as jnp
    from spades_for_blackbird_tpu.hammer import bayes, cluster
    from spades_for_blackbird_tpu.ops import dna

    k = 21
    rng = np.random.default_rng(5)
    a = "".join(rng.choice(list("ACGT"), size=k))
    # b = a with one substitution: Hamming distance 1 from a
    sub = {"A": "C", "C": "G", "G": "T", "T": "A"}[a[10]]
    b = a[:10] + sub + a[11:]
    reads = [a] * 200 + [b] * 15
    quals = [np.full(k, 40, np.int64) + 33] * 215
    codes, lengths = dna.encode_reads(reads)
    qarr = np.stack(quals).astype(np.uint8)

    table, qstats = bayes.count_kmers_stats(
        jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(qarr), k)
    assert int(table.num) == 2
    clusters = cluster.cluster_kmers(
        table.kmers, table.counts, table.num, k,
        jnp.int32(2 ** 30), jnp.float32(10.0))
    # one Hamming cluster joins them
    rep = np.asarray(clusters.rep)[:2]
    assert rep[0] == rep[1]
    sub = bayes.subcluster_kmers(table.kmers, table.counts, table.num,
                                 qstats, clusters.rep, k)
    solid = np.asarray(sub.solid)[:2]
    # high quality on both: BIC picks l=2, both centers solid
    assert solid.all(), solid
    # the heuristic keeps only the dominant center solid
    assert np.asarray(clusters.solid)[:2].sum() == 1


def test_expander_promotes_covered_kmers():
    """expander.cpp:17: a read fully covered by solid k-mers promotes
    its remaining k-mers to solid."""
    import jax.numpy as jnp
    from spades_for_blackbird_tpu.hammer import bayes
    from spades_for_blackbird_tpu.kmers import counter
    from spades_for_blackbird_tpu.ops import dna

    k = 5
    rng = np.random.default_rng(3)
    seq = "".join(rng.choice(list("ACGT"), size=30))
    codes, lengths = dna.encode_reads([seq])
    table = counter.count_kmers(jnp.asarray(codes), jnp.asarray(lengths),
                                k)
    n = int(table.num)
    solid0 = np.zeros(table.kmers.shape[0], bool)
    # mark a covering subset solid: every 3rd k-mer start still covers
    # all positions for k=5
    from spades_for_blackbird_tpu.ops import kmer as kops
    from spades_for_blackbird_tpu.ops import segments
    canon, valid, _ = kops.extract_canonical_kmers(
        jnp.asarray(codes), jnp.asarray(lengths), k)
    rows = np.asarray(segments.searchsorted_rows(
        table.kmers, canon.reshape(-1, canon.shape[2])))
    P = canon.shape[1]
    for p in range(0, len(seq) - k + 1, 3):
        solid0[rows[p]] = True
    solid0[rows[len(seq) - k]] = True
    before = solid0.sum()
    out = np.asarray(bayes.expand_solid(
        jnp.asarray(codes), jnp.asarray(lengths), table,
        jnp.asarray(solid0), k))
    assert out[:n].all(), (before, out[:n].sum(), n)


def test_chunked_stats_match_single_shot():
    """Two-pass chunked quality counting (key-count pass + lookup/
    scatter pass) must reproduce the single-shot count_kmers_stats
    (kmer_data.cpp:119-155 Merge semantics) exactly up to float
    association order."""
    import jax.numpy as jnp
    from spades_for_blackbird_tpu.hammer import bayes
    from spades_for_blackbird_tpu.ops import dna

    k = 21
    rng = np.random.default_rng(11)
    genome = "".join(rng.choice(list("ACGT"), size=400))
    reads = []
    for _ in range(64):
        s = int(rng.integers(0, len(genome) - 60))
        r = list(genome[s:s + 60])
        if rng.random() < 0.5:  # sprinkle errors
            p = int(rng.integers(0, 60))
            r[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(r))
    codes, lengths = dna.encode_reads(reads)
    quals = rng.integers(33 + 2, 33 + 41, codes.shape).astype(np.uint8)

    t1, s1 = bayes.count_kmers_stats(
        jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(quals), k)
    t1, s1 = bayes._trim_stats(t1, s1)
    t2, s2 = bayes.count_kmers_stats_chunked(
        codes, lengths, quals, k, chunk=16)
    n = int(t1.num)
    assert int(t2.num) == n
    np.testing.assert_array_equal(np.asarray(t1.kmers[:n]),
                                  np.asarray(t2.kmers[:n]))
    np.testing.assert_array_equal(np.asarray(t1.counts[:n]),
                                  np.asarray(t2.counts[:n]))
    np.testing.assert_allclose(np.asarray(s1.total_lq[:n]),
                               np.asarray(s2.total_lq[:n]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.qual_sum[:n]),
                               np.asarray(s2.qual_sum[:n]),
                               rtol=1e-5, atol=1e-3)

    # spill fallback path (device_cap_rows too small for the table)
    t3, s3 = bayes.count_kmers_stats_chunked(
        codes, lengths, quals, k, chunk=16, device_cap_rows=32)
    assert int(t3.num) == n
    np.testing.assert_array_equal(np.asarray(t1.kmers[:n]),
                                  np.asarray(t3.kmers[:n]))
    np.testing.assert_allclose(np.asarray(s1.total_lq[:n]),
                               np.asarray(s3.total_lq[:n]),
                               rtol=1e-5, atol=1e-5)


def test_chunked_subcluster_matches_single_shot():
    """Device-side chunked subclustering (cluster-aligned traced-offset
    windows, no host round trips) must equal the one-shot EM."""
    import jax.numpy as jnp
    from spades_for_blackbird_tpu.hammer import bayes
    from spades_for_blackbird_tpu.hammer.cluster import cluster_kmers
    from spades_for_blackbird_tpu.ops import dna

    k = 21
    rng = np.random.default_rng(29)
    genome = "".join(rng.choice(list("ACGT"), size=500))
    reads = []
    for _ in range(120):
        s = int(rng.integers(0, len(genome) - 60))
        r = list(genome[s:s + 60])
        if rng.random() < 0.7:
            p = int(rng.integers(0, 60))
            r[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(r))
    codes, lengths = dna.encode_reads(reads)
    quals = rng.integers(35, 74, codes.shape).astype(np.uint8)
    table, qstats = bayes.count_kmers_stats(
        jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(quals), k)
    table, qstats = bayes._trim_stats(table, qstats)
    clusters = cluster_kmers(table.kmers, table.counts, table.num, k,
                             jnp.int32(2 ** 30), jnp.float32(0.0))

    ref = bayes.subcluster_kmers(table.kmers, table.counts, table.num,
                                 qstats, clusters.rep, k)
    got = bayes.subcluster_kmers_chunked(
        table.kmers, table.counts, table.num, qstats, clusters.rep, k,
        chunk=64)
    n = int(table.num)
    np.testing.assert_array_equal(np.asarray(ref.solid[:n]),
                                  np.asarray(got.solid[:n]))
    np.testing.assert_array_equal(np.asarray(ref.is_center[:n]),
                                  np.asarray(got.is_center[:n]))
    np.testing.assert_array_equal(np.asarray(ref.center_bases[:n]),
                                  np.asarray(got.center_bases[:n]))
