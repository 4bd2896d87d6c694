"""Coverage-model fit tests: the reference-faithful mixture
(kmer_coverage_model.cpp:58-310) on clean spectra, its refusal on a
two-strain metagenome spectrum, and the graph-based uneven-depth
fallback path wired by meta/MDA modes (pipeline/assemble.py,
genomic_info_filler.cpp:31-45)."""

import numpy as np
import pytest


def _spectrum(rng, n_genomic, mean, n_err, err_geom_p=0.7,
              repeat_frac=0.06):
    """Synthesize per-unique-k-mer multiplicities: Poisson genomic
    around ``mean`` (some 2-copy repeats) + geometric error head."""
    gen = rng.poisson(mean, n_genomic)
    rep = rng.poisson(2 * mean, int(n_genomic * repeat_frac))
    err = rng.geometric(err_geom_p, n_err)
    counts = np.concatenate([gen, rep, err])
    return counts[counts > 0]


def test_reference_model_clean_spectrum():
    from spades_for_blackbird_tpu.kmers import coverage_model as cm
    rng = np.random.default_rng(0)
    counts = _spectrum(rng, n_genomic=50_000, mean=30.0, n_err=150_000)
    info = cm.fit_reference_model(counts)
    assert info is not None, "reference model must converge here"
    # fitted mean within 15% of the planted coverage
    assert abs(info.mean_coverage - 30.0) < 4.5
    # threshold separates the error head (<=3 at p=0.7) from the peak
    assert 2 <= info.ec_bound <= 15
    # genome size ~ number of genomic k-mers (copy-2 block counted once
    # per copy in the histogram tail; the /2 halves the strand count)
    assert info.genome_size > 10_000


def test_reference_model_threshold_monotone_in_coverage():
    from spades_for_blackbird_tpu.kmers import coverage_model as cm
    rng = np.random.default_rng(1)
    lo = cm.fit_reference_model(
        _spectrum(rng, 30_000, 15.0, 90_000))
    hi = cm.fit_reference_model(
        _spectrum(rng, 30_000, 60.0, 90_000))
    assert lo is not None and hi is not None
    assert hi.mean_coverage > 2.5 * lo.mean_coverage
    assert hi.ec_bound >= lo.ec_bound


def test_fit_coverage_model_uses_reference_fit():
    from spades_for_blackbird_tpu.kmers import coverage_model as cm
    rng = np.random.default_rng(2)
    counts = _spectrum(rng, 50_000, 40.0, 120_000)
    info = cm.fit_coverage_model(counts)
    assert abs(info.mean_coverage - 40.0) < 6.0


@pytest.mark.slow
def test_two_strain_spectrum_motivates_uneven_path():
    """A two-strain metagenome (5x + 45x) has no single genomic peak:
    the single-peak mixture locks onto the dominant strain and sets a
    threshold that would WIPE the 5x strain — the documented failure
    mode that makes meta/MDA modes bypass the fit entirely via
    uneven_depth (genomic_info_filler.cpp:45-62, config_struct
    uneven_depth). This test pins both halves: the fit's behavior and
    the mode routing around it."""
    from spades_for_blackbird_tpu.kmers import coverage_model as cm
    from spades_for_blackbird_tpu.pipeline import config as pcfg
    rng = np.random.default_rng(3)
    a = rng.poisson(5.0, 60_000)     # low-abundance strain
    b = rng.poisson(45.0, 20_000)    # high-abundance strain
    err = rng.geometric(0.8, 150_000)
    counts = np.concatenate([a, b, err])
    counts = counts[counts > 0]
    info = cm.fit_reference_model(counts)
    # either refuses, or converges onto the dominant peak with a
    # threshold above the low strain — never a sane two-strain answer
    assert info is None or info.ec_bound > 5
    # ... which is why meta mode must route through the graph-based
    # uneven-depth finder instead of the spectrum fit
    meta = pcfg.config_for_mode("meta")
    assert meta.uneven_depth


@pytest.mark.slow
def test_uneven_depth_pipeline_path():
    """assemble_single_k(uneven_depth=True) must route the EC bound
    through the graph-based finder and still assemble a two-strain mix
    (the one code path carrying meta-mode correctness,
    pipeline/assemble.py uneven_depth branch)."""
    import jax.numpy as jnp
    from spades_for_blackbird_tpu.ops import dna
    from spades_for_blackbird_tpu.pipeline import assemble
    from spades_for_blackbird_tpu.utils import simulate

    g1 = simulate.random_genome(3000, seed=11)
    g2 = simulate.random_genome(3000, seed=12)
    reads = []
    rng = np.random.default_rng(4)
    for genome, cov in ((g1, 12), (g2, 60)):
        n = cov * len(genome) // 100
        for _ in range(n):
            p = int(rng.integers(0, len(genome) - 100))
            reads.append(genome[p:p + 100])
    codes, lengths = dna.encode_reads(reads)
    res = assemble.assemble_single_k(
        jnp.asarray(codes), jnp.asarray(lengths), 21,
        uneven_depth=True)
    total = sum(len(s) for s, _ in res.contigs)
    # both strains assembled: coverage-normalized total length close to
    # the combined 6 kb (the uneven threshold didn't wipe the 12x strain)
    assert total > 5000


def test_uneven_ec_bound_two_strain_graph():
    """uneven_ec_bound on a graph with 12x and 60x strain edges picks a
    threshold below the low strain's coverage."""
    import jax.numpy as jnp
    from spades_for_blackbird_tpu.ops import dna
    from spades_for_blackbird_tpu.pipeline import assemble
    from spades_for_blackbird_tpu.simplify import ec_threshold
    from spades_for_blackbird_tpu.utils import simulate

    g1 = simulate.random_genome(2500, seed=21)
    reads = []
    rng = np.random.default_rng(5)
    for genome, cov in ((g1, 40),):
        n = cov * len(genome) // 100
        for _ in range(n):
            p = int(rng.integers(0, len(genome) - 100))
            reads.append(genome[p:p + 100])
    codes, lengths = dna.encode_reads(reads)
    res = assemble.assemble_single_k(
        jnp.asarray(codes), jnp.asarray(lengths), 21)
    bound = ec_threshold.uneven_ec_bound(res.graph)
    assert 0 <= bound < 40
