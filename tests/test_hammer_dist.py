"""Distributed BayesHammer (parallel/hammer_dist.py) vs single device.

The sharded pipeline — local count + all_gather merge, psum'd quality
stats, replicated subclustering, psum-OR'd solid expansion, data-
parallel voting — must reproduce the single-device
hammer.correct_reads_bayes corrections on the same errorful reads
(projects/hammer/main.cpp:118-260 semantics).
"""

import numpy as np
import pytest

from spades_for_blackbird_tpu.ops import dna
from spades_for_blackbird_tpu.utils import simulate

pytestmark = pytest.mark.slow


def _errorful_reads(seed=23, genome_len=3000, n_pairs=500, read_len=60):
    genome = simulate.random_genome(genome_len, seed=seed)
    r1, q1, r2, q2 = simulate.simulate_paired_reads(
        genome, n_pairs, read_len=read_len, insert_mean=150.0,
        insert_sd=10.0, error_rate=0.01, seed=seed + 1)
    codes, lengths = dna.encode_reads(r1 + r2)
    quals = np.stack([np.frombuffer(q.encode(), np.uint8)
                      for q in q1 + q2])
    return codes, lengths, quals


def test_sharded_hammer_matches_single_device():
    import jax
    assert len(jax.devices()) >= 8, "conftest should give 8 CPU devices"
    from spades_for_blackbird_tpu.hammer import correct as hcorrect
    from spades_for_blackbird_tpu.parallel import hammer_dist, mesh

    codes, lengths, quals = _errorful_reads()
    k = 21

    single_codes, single_stats = hcorrect._correct_reads_bayes(
        codes, lengths, quals, k, max_iterations=2)
    single_np = np.asarray(single_codes)

    m = mesh.make_mesh(8)
    correct = hammer_dist.make_sharded_hammer(m, k, max_iterations=2)
    shard_codes, shard_stats = correct(codes, lengths, quals)
    shard_np = np.asarray(shard_codes)[:codes.shape[0]]

    n_changed_single = int(
        (single_np != codes).sum())
    assert single_stats["changed_bases"] > 0, \
        "test needs reads the corrector actually fixes"
    np.testing.assert_array_equal(single_np, shard_np)
    assert shard_stats["changed_bases"] == single_stats["changed_bases"]
    assert shard_stats["solid_kmers"] == single_stats["solid_kmers"]
    assert n_changed_single > 0
