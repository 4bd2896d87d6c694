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


def fit_coverage_model(counts: np.ndarray, max_count: int = 256
                       ) -> GenomicInfo:
    """Fit from per-unique-k-mer counts (padded entries must be stripped)."""
    counts = np.asarray(counts)
    counts = counts[counts > 0]
    if counts.size == 0:
        return GenomicInfo(0.0, 0.0, 0.0, 0)
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
