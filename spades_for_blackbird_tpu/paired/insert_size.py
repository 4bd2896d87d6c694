"""Insert-size estimation from read pairs mapped to a common edge.

Replaces the reference's ``InsertSizeCounter``
(common/paired_info/is_counter.hpp, driven at
projects/spades/pair_info_count.cpp:186-230): pairs whose mates map to the
same edge give insert-size observations; the library statistics are the
median / MAD / trimmed mean of that sample.

Convention: an FR paired-end library with mates (r1, r2) has rc(r2)
mapping downstream of r1 on the same strand; insert size = outer
distance = start(rc r2) + len(r2) - start(r1).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..mapping.mapper import ReadMapping


@dataclass
class InsertSizeStats:
    median: float
    mad: float
    mean: float
    count: int
    # 1% / 99% quantiles (the reference's insert_size_left/right_quantile,
    # library_data.hpp) and the full histogram (insert_size_distribution),
    # consumed by the exSPAnder ideal-pair-info counter
    # (modules/path_extend/ideal_pair_info.hpp:23).
    is_min: int = 0
    is_max: int = 0
    histogram: dict | None = None

    @property
    def deviation(self) -> float:
        """insert_size_deviation analogue: 1.4826 * MAD."""
        return 1.4826 * self.mad


def estimate_insert_size(m1: ReadMapping, m2rc: ReadMapping,
                         len2: np.ndarray) -> InsertSizeStats:
    """m1 = mapping of first mates; m2rc = mapping of REVERSE-COMPLEMENTED
    second mates; len2 = (R,) lengths of second mates."""
    oe1 = np.asarray(m1.oriented_edge)
    oe2 = np.asarray(m2rc.oriented_edge)
    ok = np.asarray(m1.mapped) & np.asarray(m2rc.mapped) & (oe1 == oe2)
    isz = (np.asarray(m2rc.start) + np.asarray(len2)
           - np.asarray(m1.start))[ok]
    isz = isz[(isz > 0) & (isz < 10 * max(1, int(np.median(isz)) if isz.size
                                          else 1))]
    if isz.size == 0:
        return InsertSizeStats(0.0, 0.0, 0.0, 0)
    med = float(np.median(isz))
    mad = float(np.median(np.abs(isz - med)))
    # trimmed mean within 5 MADs (insert_size_refiner.hpp behavior)
    keep = np.abs(isz - med) <= 5 * max(mad, 1.0)
    vals, counts = np.unique(isz[keep], return_counts=True)
    hist = {int(v): int(c) for v, c in zip(vals, counts)}
    return InsertSizeStats(med, mad, float(isz[keep].mean()),
                           int(isz.size),
                           is_min=int(np.percentile(isz, 1)),
                           is_max=int(np.percentile(isz, 99)),
                           histogram=hist)
