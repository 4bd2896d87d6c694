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


_IS_BINS = 1 << 15  # insert sizes clamp here (32 kb upper bound)


def estimate_insert_size(m1: ReadMapping, m2rc: ReadMapping,
                         len2: np.ndarray) -> InsertSizeStats:
    """m1 = mapping of first mates; m2rc = mapping of REVERSE-COMPLEMENTED
    second mates; len2 = (R,) lengths of second mates.

    The per-pair observations are reduced to a histogram ON DEVICE and
    only the (few-KB) histogram crosses to the host; median/MAD/trimmed
    mean are then exact functions of it."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _is_hist(oe1, oe2, ok1, ok2, s1, s2, l2):
        ok = ok1 & ok2 & (oe1 == oe2)
        isz = s2 + l2 - s1
        ok = ok & (isz > 0) & (isz < _IS_BINS)
        b = jnp.clip(isz, 0, _IS_BINS - 1)
        return jnp.zeros((_IS_BINS,), jnp.int32).at[
            jnp.where(ok, b, 0)].add(ok.astype(jnp.int32))

    hist_arr = np.asarray(_is_hist(
        jnp.asarray(m1.oriented_edge), jnp.asarray(m2rc.oriented_edge),
        jnp.asarray(m1.mapped), jnp.asarray(m2rc.mapped),
        jnp.asarray(m1.start), jnp.asarray(m2rc.start),
        jnp.asarray(len2))).astype(np.int64)
    hist_arr[0] = 0
    total = int(hist_arr.sum())
    if total == 0:
        return InsertSizeStats(0.0, 0.0, 0.0, 0)
    xs = np.arange(_IS_BINS, dtype=np.int64)
    cum = np.cumsum(hist_arr)

    def _quantile(q):
        return int(np.searchsorted(cum, q * total, side="left"))

    med = float(_quantile(0.5))
    # the original sample filter: drop observations >= 10 * median
    cut = int(min(10 * max(med, 1.0), _IS_BINS))
    hist_arr[cut:] = 0
    total = int(hist_arr.sum())
    if total == 0:
        return InsertSizeStats(0.0, 0.0, 0.0, 0)
    cum = np.cumsum(hist_arr)
    med = float(_quantile(0.5))
    dev = np.abs(xs - med)
    order = np.argsort(dev, kind="stable")
    mad_cum = np.cumsum(hist_arr[order])
    mad = float(dev[order][int(np.searchsorted(mad_cum, total / 2,
                                               side="left"))])
    # trimmed mean within 5 MADs (insert_size_refiner.hpp behavior)
    keep = dev <= 5 * max(mad, 1.0)
    kept = hist_arr * keep
    mean = float((kept * xs).sum() / max(kept.sum(), 1))
    hist = {int(v): int(c) for v, c in zip(xs[kept > 0], kept[kept > 0])}
    return InsertSizeStats(med, mad, mean, total,
                           is_min=_quantile(0.01),
                           is_max=_quantile(0.99),
                           histogram=hist)
