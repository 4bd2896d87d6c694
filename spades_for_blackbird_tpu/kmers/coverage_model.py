"""Coverage-model fit: separate erroneous from genomic k-mer coverage.

Stand-in for the reference's mixture-model fit
(assembler/src/common/modules/coverage_model/kmer_coverage_model.cpp:58-310,
zero-truncated error + geometric-skew-normal genomic series optimized with
Nelder-Mead/EM) consumed by GenomicInfoFiller
(common/stages/genomic_info_filler.cpp:31-73). This version extracts the
same outputs (ec_bound, trusted_bound, mean genomic coverage, genome-size
estimate) from the count histogram by valley detection; the full
mixture-model fit is planned to replace the valley heuristic.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class GenomicInfo:
    ec_bound: float        # counts <= this are considered erroneous
    trusted_bound: float   # counts >= this are confidently genomic
    mean_coverage: float   # mean genomic k-mer multiplicity
    genome_size: int       # estimated distinct genomic k-mers


def _nbinom_logpmf(x, mean, disp):
    """Negative binomial log-pmf parameterized by mean and dispersion r."""
    from math import lgamma
    r = disp
    p = r / (r + mean)
    x = np.asarray(x, dtype=np.float64)
    lg = np.vectorize(lgamma)
    return (lg(x + r) - lg(r) - lg(x + 1) + r * np.log(p)
            + x * np.log1p(-p))


def fit_mixture(counts: np.ndarray, max_count: int = 512,
                iters: int = 40) -> GenomicInfo | None:
    """EM fit of a two-component mixture on the count histogram:
    errors ~ geometric (zero-truncated), genomic ~ negative binomial.

    The principled replacement for the valley heuristic, standing in for
    the reference's zero-truncated + geometric-skew-normal mixture
    optimized with Nelder-Mead/EM (kmer_coverage_model.cpp:58-310).
    Returns None when the fit degenerates (uneven coverage) — callers
    fall back to the valley estimate like genomic_info_filler.cpp:60.
    """
    counts = np.asarray(counts)
    counts = counts[counts > 0]
    if counts.size < 100:
        return None
    hist = np.bincount(np.minimum(counts, max_count)).astype(np.float64)
    xs = np.arange(len(hist), dtype=np.float64)
    w = hist.copy()
    w[0] = 0.0
    total = w.sum()
    if total <= 0:
        return None

    # init: error geometric p from low counts, genomic mean from the
    # high-count mass
    peak = 3 + int(np.argmax(hist[3:])) if len(hist) > 4 else 2
    gmean = max(float(peak), 4.0)
    gdisp = 10.0
    p_err = 0.5
    pi_err = 0.5
    xs_safe = np.maximum(xs, 1.0)
    for _ in range(iters):
        # E step (zero-truncated geometric pmf: p (1-p)^(x-1))
        log_err = np.log(p_err) + (xs_safe - 1) * np.log1p(-p_err)
        log_gen = _nbinom_logpmf(xs_safe, gmean, gdisp)
        le = np.log(max(pi_err, 1e-12)) + log_err
        lg_ = np.log(max(1 - pi_err, 1e-12)) + log_gen
        m = np.maximum(le, lg_)
        denom = m + np.log(np.exp(le - m) + np.exp(lg_ - m))
        resp_err = np.exp(le - denom)
        # M step
        we = w * resp_err
        wg = w * (1 - resp_err)
        if we.sum() <= 0 or wg.sum() <= 0:
            return None
        pi_err = we.sum() / total
        mean_err = (we * xs).sum() / we.sum()
        p_err = min(max(1.0 / max(mean_err, 1.0 + 1e-6), 1e-4), 0.999)
        gmean = (wg * xs).sum() / wg.sum()
        var_g = (wg * (xs - gmean) ** 2).sum() / wg.sum()
        if var_g > gmean * 1.05:
            gdisp = gmean ** 2 / (var_g - gmean)
        gdisp = min(max(gdisp, 0.5), 1e4)

    if gmean < 3.0 or not np.isfinite(gmean):
        return None  # no separated genomic peak: uneven coverage
    # ec bound: first count where genomic posterior dominates
    log_err = np.log(p_err) + (xs_safe - 1) * np.log1p(-p_err)
    log_gen = _nbinom_logpmf(xs_safe, gmean, gdisp)
    err_dom = (np.log(max(pi_err, 1e-12)) + log_err >
               np.log(max(1 - pi_err, 1e-12)) + log_gen)
    cross = 1
    for c in range(1, int(gmean) + 1):
        if c < len(err_dom) and err_dom[c]:
            cross = c
    genomic = counts[counts > cross]
    if genomic.size == 0:
        return None
    return GenomicInfo(
        ec_bound=float(cross),
        trusted_bound=float(min(gmean / 2.0, cross * 2 + 1)),
        mean_coverage=float(genomic.mean()),
        genome_size=int(genomic.size),
    )


def fit_coverage_model(counts: np.ndarray, max_count: int = 256
                       ) -> GenomicInfo:
    """Fit from per-unique-k-mer counts (padded entries must be stripped)."""
    counts = np.asarray(counts)
    counts = counts[counts > 0]
    if counts.size == 0:
        return GenomicInfo(0.0, 0.0, 0.0, 0)
    fitted = fit_mixture(counts)
    if fitted is not None:
        return fitted
    # valley fallback (uneven coverage / tiny samples)
    hist = np.bincount(np.minimum(counts, max_count))
    hist = np.append(hist, np.zeros(max(0, 4 - len(hist)), np.int64))
    # valley: minimum of the histogram between the error head and the
    # genomic peak (the mixture components' crossing point)
    peak = 3 + int(np.argmax(hist[3:])) if len(hist) > 3 else 1
    if peak <= 3:
        valley = 1
    else:
        # take the median index of the minimum plateau: low-error data has
        # a wide zero run between error head and genomic peak, and the
        # separation bound belongs mid-run, not at the first zero
        region = hist[1:peak]
        min_idxs = np.nonzero(region == region.min())[0]
        valley = 1 + int(min_idxs[len(min_idxs) // 2])
    genomic = counts[counts > valley]
    if genomic.size == 0:
        # uneven coverage fallback (the reference falls back to
        # ErroneousConnectionThresholdFinder, genomic_info_filler.cpp:60)
        return GenomicInfo(float(valley), float(valley + 1),
                           float(np.mean(counts)), int(counts.size))
    mean_cov = float(np.mean(genomic))
    return GenomicInfo(
        ec_bound=float(valley),
        trusted_bound=float(min(mean_cov / 2.0, valley * 2 + 1)),
        mean_coverage=mean_cov,
        genome_size=int(genomic.size),
    )
