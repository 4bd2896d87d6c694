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
    return InsertSizeStats(med, mad, float(isz[keep].mean()),
                           int(isz.size))
