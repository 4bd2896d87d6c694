"""Gap-analysis unit tests (gap_analyzer.cpp semantics)."""

import numpy as np


def _codes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode(), np.uint8)


def test_hamming_finds_exact_overlap():
    from spades_for_blackbird_tpu.path_extend import gap_analyzer as ga
    rng = np.random.default_rng(0)
    a = rng.integers(0, 4, 300).astype(np.uint8)
    b = np.concatenate([a[-47:], rng.integers(0, 4, 200).astype(np.uint8)])
    p = ga.GapAnalyzerParams()
    fixed = ga.hamming_fix_gap(a, b, est_gap=-40, k=55, p=p)
    assert fixed == -47


def test_hamming_tolerates_mismatches_within_score():
    from spades_for_blackbird_tpu.path_extend import gap_analyzer as ga
    rng = np.random.default_rng(1)
    a = rng.integers(0, 4, 300).astype(np.uint8)
    ov = a[-60:].copy()
    ov[10] ^= 1  # one mismatch in 60 -> identity 0.983 > 0.9
    b = np.concatenate([ov, rng.integers(0, 4, 200).astype(np.uint8)])
    fixed = ga.hamming_fix_gap(a, b, est_gap=-50, k=55,
                               p=ga.GapAnalyzerParams())
    assert fixed == -60


def test_composite_rejects_unsupported_strong_overlap():
    """estimated_dist far below must_overlap_threshold with no real
    overlap -> the join is unreliable (composite returns REJECT,
    gap_analyzer.cpp:152-154)."""
    from spades_for_blackbird_tpu.path_extend import gap_analyzer as ga
    rng = np.random.default_rng(2)
    a = rng.integers(0, 4, 300).astype(np.uint8)
    b = rng.integers(0, 4, 300).astype(np.uint8)
    p = ga.GapAnalyzerParams()  # must_overlap_threshold=-225
    out = ga.composite_fix_gap(a, b, est_gap=-300, k=55, p=p)
    assert out is ga.REJECT


def test_composite_clamps_to_artificial_gap():
    from spades_for_blackbird_tpu.path_extend import gap_analyzer as ga
    rng = np.random.default_rng(3)
    a = rng.integers(0, 4, 300).astype(np.uint8)
    b = rng.integers(0, 4, 300).astype(np.uint8)
    out = ga.composite_fix_gap(a, b, est_gap=-30, k=55,
                               p=ga.GapAnalyzerParams())
    assert out == 10  # artificial_gap


def test_composite_passes_far_gaps_through():
    from spades_for_blackbird_tpu.path_extend import gap_analyzer as ga
    a = np.zeros(10, np.uint8)
    b = np.ones(10, np.uint8)
    assert ga.composite_fix_gap(a, b, est_gap=500, k=55,
                                p=ga.GapAnalyzerParams()) == 500
