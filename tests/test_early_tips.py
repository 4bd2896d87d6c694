"""Pre-graph early tip clipping (early_simplification.hpp:37-160)."""

import numpy as np
import jax.numpy as jnp
import pytest


def _table(reads, k):
    from spades_for_blackbird_tpu.kmers import counter, extension
    from spades_for_blackbird_tpu.ops import dna
    codes, lengths = dna.encode_reads(reads)
    kp1 = counter.count_kmers(jnp.asarray(codes), jnp.asarray(lengths),
                              k + 1)
    vt = extension.build_vertex_table(kp1, k)
    return kp1, vt


def test_clips_short_error_tip():
    """A read with one terminal error grows a short side branch off the
    main chain; early clipping removes exactly the branch rows."""
    from spades_for_blackbird_tpu.kmers import early_tips
    rng = np.random.default_rng(0)
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
    reads = [genome[i:i + 100] for i in range(0, 300, 4)]
    # tip: a read whose last base is wrong -> k+1-mers diverge at the end
    bad = genome[40:139] + ("A" if genome[139] != "A" else "C")
    reads.append(bad)
    k = 21
    kp1, vt = _table(reads, k)
    before = int(kp1.num)
    kp1f, n = early_tips.clip_early_tips(kp1, vt, k, 100 - k)
    assert n > 0
    assert int(kp1f.num) == before - n
    # clean data: clipping the clean table again removes nothing
    from spades_for_blackbird_tpu.kmers import extension
    vt2 = extension.build_vertex_table(kp1f, k)
    _, n2 = early_tips.clip_early_tips(kp1f, vt2, k, 100 - k)
    assert n2 == 0


def test_keeps_longest_branch_at_fork():
    """Two dead-end branches off a junction: only the shorter is a
    removable tip (RemoveTips keeps the max, early_simplification.hpp:
    121-135)."""
    from spades_for_blackbird_tpu.kmers import early_tips
    rng = np.random.default_rng(1)
    stem = "".join("ACGT"[i] for i in rng.integers(0, 4, 120))
    long_arm = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    short_arm = "".join("ACGT"[i] for i in rng.integers(0, 4, 8))
    k = 21
    reads = [stem + long_arm, stem + short_arm]
    kp1, vt = _table(reads, k)
    kp1f, n = early_tips.clip_early_tips(kp1, vt, k, 200)
    # the short arm contributes the rows that diverge from the long arm
    assert n > 0
    assert int(kp1f.num) < int(kp1.num)


def test_equal_tips_are_kept():
    """All branches tips of equal length -> none strictly shorter than
    the max -> nothing removed."""
    from spades_for_blackbird_tpu.kmers import early_tips
    rng = np.random.default_rng(2)
    stem = "".join("ACGT"[i] for i in rng.integers(0, 4, 100))
    a = "".join("ACGT"[i] for i in rng.integers(0, 4, 10))
    k = 21
    b = ("T" if a[0] != "T" else "G") + a[1:]
    reads = [stem + a, stem + b]
    kp1, vt = _table(reads, k)
    _, n = early_tips.clip_early_tips(kp1, vt, k, 200)
    assert n == 0


def test_pipeline_shrinks_table_same_contigs():
    """VERDICT item 8 'done when': a high-error batch shows reduced
    edge capacity at equal final contigs."""
    import jax.numpy as jnp
    from spades_for_blackbird_tpu.ops import dna
    from spades_for_blackbird_tpu.pipeline import assemble
    from spades_for_blackbird_tpu.utils import simulate

    genome = simulate.random_genome(4000, seed=5)
    r1, q1, r2, q2 = simulate.simulate_paired_reads(
        genome, 800, read_len=100, insert_mean=250, insert_sd=25,
        error_rate=0.01, seed=6)
    codes, lengths = dna.encode_reads(r1 + r2)
    ja, jl = jnp.asarray(codes), jnp.asarray(lengths)
    res_on = assemble.assemble_single_k(ja, jl, 21, min_kmer_count=2)
    res_off = assemble.assemble_single_k(ja, jl, 21, min_kmer_count=2,
                                         early_tip_clip=False)
    on = sorted(s for s, _ in res_on.contigs)
    off = sorted(s for s, _ in res_off.contigs)
    assert on == off, "early clipping must not change final contigs here"
