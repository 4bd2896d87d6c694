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
