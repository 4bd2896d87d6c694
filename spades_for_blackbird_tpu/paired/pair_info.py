"""Paired-info index: (edge1, edge2) -> histogram of (distance, weight).

TPU-native replacement of the reference's ``PairedIndex``
(common/paired_info/paired_info.hpp:24-660) and ``LatePairedIndexFiller``
(pair_info_filler.hpp): instead of concurrent hash-map buffers, the whole
unclustered index is one sorted array of (e1, e2, d) observations built by
a single sort + run-length reduction.

Distance convention (matches the reference's left-start to left-start
points, index_point.hpp): an observation from a mate pair says oriented
edge e2's start lies ``d`` bases right of oriented edge e1's start:
d = start1 - start2 + IS_shift, with IS_shift = insert_size - len(r2)
applied by the caller.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..mapping.mapper import ReadMapping
from ..ops import segments


class PairedIndex(NamedTuple):
    """Sorted unique (e1, e2, d) rows with weights (padded ragged)."""
    e1: jax.Array       # (N,) int32 oriented edge ids
    e2: jax.Array       # (N,) int32
    dist: jax.Array     # (N,) int32
    weight: jax.Array   # (N,) float32
    num: jax.Array      # () int32

    @property
    def capacity(self) -> int:
        return self.e1.shape[0]


_DIST_BIAS = 1 << 24


@jax.jit
def fill_paired_index(m1: ReadMapping, m2rc: ReadMapping,
                      is_shift: jax.Array) -> PairedIndex:
    """Build the unclustered paired index from mapped mate pairs.

    m1: mappings of first mates; m2rc: mappings of reverse-complemented
    second mates (both oriented downstream); is_shift: scalar
    insert_size - read2_len.
    """
    ok = m1.mapped & m2rc.mapped
    e1, e2 = m1.oriented_edge, m2rc.oriented_edge
    d = m1.start - m2rc.start + is_shift.astype(jnp.int32)
    # same-edge pairs carry IS info, not inter-edge info; keep them (d~0
    # self-distance) — the reference stores self-pairs too.
    keys = jnp.stack([
        e1.astype(jnp.uint32), e2.astype(jnp.uint32),
        (d + _DIST_BIAS).astype(jnp.uint32)], axis=1)
    uniq, counts, num = segments.count_sorted(keys, ok)
    return PairedIndex(
        e1=uniq[:, 0].astype(jnp.int32),
        e2=uniq[:, 1].astype(jnp.int32),
        dist=uniq[:, 2].astype(jnp.int32) - _DIST_BIAS,
        weight=counts.astype(jnp.float32),
        num=num,
    )


@jax.jit
def fill_paired_index_multi(m1, m2rc, is_shift: jax.Array) -> PairedIndex:
    """Paired index from CHAIN mappings (mapper.ChainMapping).

    Mirrors the reference's LatePairedIndexFiller over MappingPaths
    (pair_info_filler.hpp: every (edge of path1, edge of path2)
    combination gets a point) plus rnaSPAdes' split-read threading
    (pair_info_count.cpp split-read paths): consecutive placements of
    ONE read are junction-crossing evidence and enter the same index as
    zero-shift pairs.
    """
    R, C = m1.oriented_edge.shape
    ok1 = (m1.oriented_edge >= 0) & m1.mapped[:, None]
    ok2 = (m2rc.oriented_edge >= 0) & m2rc.mapped[:, None]

    rows_e1, rows_e2, rows_d, rows_ok = [], [], [], []

    # cross pairs mate1 x mate2 (C*C per read pair)
    e1x = jnp.broadcast_to(m1.oriented_edge[:, :, None], (R, C, C))
    e2x = jnp.broadcast_to(m2rc.oriented_edge[:, None, :], (R, C, C))
    dx = (m1.start[:, :, None] - m2rc.start[:, None, :]
          + is_shift.astype(jnp.int32))
    okx = ok1[:, :, None] & ok2[:, None, :]
    rows_e1.append(e1x.reshape(-1))
    rows_e2.append(e2x.reshape(-1))
    rows_d.append(dx.reshape(-1))
    rows_ok.append(okx.reshape(-1))

    # split-read chain pairs within each mate (i < j, shift 0)
    for m, ok in ((m1, ok1), (m2rc, ok2)):
        for i in range(C - 1):
            for j in range(i + 1, C):
                rows_e1.append(m.oriented_edge[:, i])
                rows_e2.append(m.oriented_edge[:, j])
                rows_d.append(m.start[:, i] - m.start[:, j])
                rows_ok.append(ok[:, i] & ok[:, j])

    e1 = jnp.concatenate(rows_e1)
    e2 = jnp.concatenate(rows_e2)
    d = jnp.concatenate(rows_d)
    ok = jnp.concatenate(rows_ok)
    keys = jnp.stack([
        e1.astype(jnp.uint32), e2.astype(jnp.uint32),
        (d + _DIST_BIAS).astype(jnp.uint32)], axis=1)
    uniq, counts, num = segments.count_sorted(keys, ok)
    return PairedIndex(
        e1=uniq[:, 0].astype(jnp.int32),
        e2=uniq[:, 1].astype(jnp.int32),
        dist=uniq[:, 2].astype(jnp.int32) - _DIST_BIAS,
        weight=counts.astype(jnp.float32),
        num=num,
    )


@jax.jit
def cluster_distances(idx: PairedIndex, max_spread: jax.Array
                      ) -> PairedIndex:
    """Collapse raw observations into per-(e1,e2) distance estimates.

    Simplified analogue of the reference's DistanceEstimator
    (paired_info/distance_estimation.cpp:97 EstimateEdgePairDistances):
    per (e1, e2) group, observations within ``max_spread`` of the weighted
    mode merge into one point at the weighted mean with summed weight;
    observations far from the mode are dropped (contradiction cleaning,
    pair_info_filters.hpp).
    """
    N = idx.capacity
    valid = jnp.arange(N) < idx.num
    # group id per (e1, e2): rows are already sorted by (e1, e2, d)
    keys2 = jnp.stack([idx.e1.astype(jnp.uint32),
                       idx.e2.astype(jnp.uint32)], axis=1)
    seg_start = (~segments.rows_equal_prev(keys2)) & valid
    gid = jnp.cumsum(seg_start.astype(jnp.int32)) - 1
    gid = jnp.where(valid, jnp.maximum(gid, 0), N)
    num_groups = jnp.sum(seg_start.astype(jnp.int32))

    # weighted mode per group
    best_w = jnp.zeros((N,), jnp.float32).at[gid].max(
        jnp.where(valid, idx.weight, 0.0), mode="drop")
    is_mode = valid & (idx.weight == best_w[jnp.minimum(gid, N - 1)])
    mode_d = jnp.full((N,), jnp.int32(1 << 30)).at[
        jnp.where(is_mode, gid, N)].min(idx.dist, mode="drop")

    near = valid & (jnp.abs(idx.dist - mode_d[jnp.minimum(gid, N - 1)])
                    <= max_spread)
    wsum = jnp.zeros((N,), jnp.float32).at[
        jnp.where(near, gid, N)].add(idx.weight, mode="drop")
    dsum = jnp.zeros((N,), jnp.float32).at[
        jnp.where(near, gid, N)].add(
        idx.weight * idx.dist.astype(jnp.float32), mode="drop")
    in_range = jnp.arange(N) < num_groups
    dmean = jnp.where(wsum > 0, dsum / jnp.maximum(wsum, 1e-9), 0.0)

    ge1 = jnp.zeros((N,), jnp.int32).at[
        jnp.where(seg_start, gid, N)].max(idx.e1, mode="drop")
    ge2 = jnp.zeros((N,), jnp.int32).at[
        jnp.where(seg_start, gid, N)].max(idx.e2, mode="drop")
    return PairedIndex(
        e1=jnp.where(in_range, ge1, 0),
        e2=jnp.where(in_range, ge2, 0),
        dist=jnp.where(in_range, jnp.round(dmean).astype(jnp.int32), 0),
        weight=jnp.where(in_range, wsum, 0.0),
        num=num_groups,
    )


@jax.jit
def cluster_distances_smoothing(idx: PairedIndex, max_gap: jax.Array,
                                min_weight: jax.Array) -> PairedIndex:
    """Multi-peak distance estimation for wide-insert (mate-pair) data.

    Counterpart of the reference's smoothing estimator
    (paired_info/smoothing_distance_estimation.hpp:19 +
    data_divider.hpp + peak_finder.hpp): within each (e1, e2) group the
    sorted distance observations are divided wherever consecutive
    distances differ by more than ``max_gap`` (DataDivider), and every
    cluster above ``min_weight`` becomes one estimated point at its
    weighted mean (the peak).  Unlike :func:`cluster_distances` this
    keeps several peaks per edge pair — mate-pair histograms are too
    broad and multi-modal for a single mode.
    """
    N = idx.capacity
    valid = jnp.arange(N) < idx.num
    keys2 = jnp.stack([idx.e1.astype(jnp.uint32),
                       idx.e2.astype(jnp.uint32)], axis=1)
    new_group = (~segments.rows_equal_prev(keys2)) & valid
    prev_d = jnp.concatenate([idx.dist[:1], idx.dist[:-1]])
    gap_break = (idx.dist - prev_d) > max_gap
    new_cluster = valid & (new_group | gap_break)
    cid = jnp.cumsum(new_cluster.astype(jnp.int32)) - 1
    cid = jnp.where(valid, jnp.maximum(cid, 0), N)
    num_clusters = jnp.sum(new_cluster.astype(jnp.int32))

    wsum = jnp.zeros((N,), jnp.float32).at[cid].add(
        jnp.where(valid, idx.weight, 0.0), mode="drop")
    dsum = jnp.zeros((N,), jnp.float32).at[cid].add(
        jnp.where(valid, idx.weight * idx.dist.astype(jnp.float32), 0.0),
        mode="drop")
    ce1 = jnp.zeros((N,), jnp.int32).at[
        jnp.where(new_cluster, cid, N)].max(idx.e1, mode="drop")
    ce2 = jnp.zeros((N,), jnp.int32).at[
        jnp.where(new_cluster, cid, N)].max(idx.e2, mode="drop")
    in_range = (jnp.arange(N) < num_clusters) & (wsum >= min_weight)
    dmean = jnp.where(wsum > 0, dsum / jnp.maximum(wsum, 1e-9), 0.0)

    # compact the surviving clusters to the front (stable order)
    order = jnp.argsort(jnp.where(in_range, jnp.arange(N), N + 1))
    keep_n = jnp.sum(in_range.astype(jnp.int32))
    return PairedIndex(
        e1=jnp.where(jnp.arange(N) < keep_n, ce1[order], 0),
        e2=jnp.where(jnp.arange(N) < keep_n, ce2[order], 0),
        dist=jnp.where(jnp.arange(N) < keep_n,
                       jnp.round(dmean[order]).astype(jnp.int32), 0),
        weight=jnp.where(jnp.arange(N) < keep_n, wsum[order], 0.0),
        num=keep_n,
    )


def improve_pair_info(idx: PairedIndex, max_spread: int = 10,
                      weight_coeff: float = 0.5) -> PairedIndex:
    """Transitive improvement (paired_info/pair_info_improver.hpp):
    (A,B,d1) + (B,C,d2) implies (A,C,d1+d2); missing implied points are
    added with weight ``weight_coeff * min(w1, w2)``, existing nearby
    points (within ``max_spread``) are left alone.  Host-side: the
    clustered index is small (one row per adjacent edge pair)."""
    import numpy as np
    n = int(idx.num)
    e1 = np.asarray(idx.e1)[:n]
    e2 = np.asarray(idx.e2)[:n]
    d = np.asarray(idx.dist)[:n]
    w = np.asarray(idx.weight)[:n]
    by_e1: dict[int, list[int]] = {}
    existing: dict[tuple[int, int], list[int]] = {}
    for i in range(n):
        by_e1.setdefault(int(e1[i]), []).append(i)
        existing.setdefault((int(e1[i]), int(e2[i])), []).append(i)
    add = {}
    for i in range(n):
        for j in by_e1.get(int(e2[i]), []):
            a, c = int(e1[i]), int(e2[j])
            if a == c:
                continue
            dd = int(d[i]) + int(d[j])
            ww = weight_coeff * min(float(w[i]), float(w[j]))
            near = any(abs(int(d[x]) - dd) <= max_spread
                       for x in existing.get((a, c), []))
            if near:
                continue
            key = (a, c, dd)
            add[key] = max(add.get(key, 0.0), ww)
    if not add:
        return idx
    rows = sorted(existing_rows(e1, e2, d, w) + sorted(add.items()))
    return _rebuild(rows, idx.capacity)


def existing_rows(e1, e2, d, w):
    return [((int(a), int(b), int(dd)), float(ww))
            for a, b, dd, ww in zip(e1, e2, d, w)]


def _rebuild(rows, capacity):
    import numpy as np
    n = len(rows)
    cap = max(capacity, n)
    E1 = np.zeros(cap, np.int32)
    E2 = np.zeros(cap, np.int32)
    D = np.zeros(cap, np.int32)
    W = np.zeros(cap, np.float32)
    for i, ((a, b, dd), ww) in enumerate(rows):
        E1[i], E2[i], D[i], W[i] = a, b, dd, ww
    return PairedIndex(e1=jnp.asarray(E1), e2=jnp.asarray(E2),
                       dist=jnp.asarray(D), weight=jnp.asarray(W),
                       num=jnp.int32(n))


def merge_paired_indices(indices: list[PairedIndex]) -> PairedIndex:
    """Merge clustered indices from multiple libraries into one table,
    summing weights of identical (e1, e2, d) rows (the reference keeps
    ``PairedIndices`` per lib, paired_info.hpp:659; scaffolding joins
    pool evidence across libraries)."""
    import numpy as np
    if len(indices) == 1:
        return indices[0]
    acc: dict[tuple[int, int, int], float] = {}
    for idx in indices:
        n = int(idx.num)
        for key, w in existing_rows(np.asarray(idx.e1)[:n],
                                    np.asarray(idx.e2)[:n],
                                    np.asarray(idx.dist)[:n],
                                    np.asarray(idx.weight)[:n]):
            acc[key] = acc.get(key, 0.0) + w
    rows = sorted(acc.items())
    return _rebuild(rows, max((i.capacity for i in indices), default=1))
