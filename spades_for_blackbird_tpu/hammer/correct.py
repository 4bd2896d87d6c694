"""Read error correction by solid-k-mer voting (BayesHammer's corrector).

TPU-native replacement of projects/hammer's read correction loop
(read_corrector.cpp:19 + expander.cpp:17): every read position gathers
votes from all k-mers covering it — a solid k-mer votes its own bases, an
erroneous k-mer votes its cluster center's bases — and the majority base
wins. The whole read batch corrects in one jit region of gathers and a
(R, L, 4) scatter-add, replacing the per-read OpenMP loop.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kmers import counter, coverage_model
from ..ops import dna, kmer, segments
from .cluster import HammerClusters, cluster_kmers


class CorrectionResult(NamedTuple):
    codes: jax.Array          # corrected read codes
    changed_bases: jax.Array  # () int32
    solid_kmers: jax.Array    # () int32 number of solid unique kmers


@functools.partial(jax.jit, static_argnames=("k",))
def correct_batch(codes: jax.Array, lengths: jax.Array,
                  table: counter.KmerTable, clusters: HammerClusters,
                  k: int) -> CorrectionResult:
    R, L = codes.shape
    N = table.capacity
    canon, valid, is_fwd = kmer.extract_canonical_kmers(codes, lengths, k)
    P = canon.shape[1]
    W = canon.shape[2]
    flat = canon.reshape(-1, W)
    row = segments.searchsorted_rows(table.kmers, flat).reshape(R, P)
    found = (row < table.num) & valid
    safe_row = jnp.where(found, row, 0)

    solid = clusters.solid[safe_row] & found
    center_row = clusters.center_of[safe_row]
    has_center = found & (center_row < N)
    vote_row = jnp.where(solid, safe_row, jnp.minimum(center_row, N - 1))
    can_vote = solid | has_center

    vk = table.kmers[vote_row]                      # (R, P, W) canonical
    # orient the voting k-mer the way the read runs
    vk_rc = dna.revcomp_kmers(vk, k)
    vk = jnp.where(is_fwd[..., None], vk, vk_rc)
    bases = dna.unpack_kmers(vk, k)                 # (R, P, k)

    pos = jnp.arange(P)[:, None] + jnp.arange(k)[None, :]      # (P, k)
    read_id = jnp.broadcast_to(jnp.arange(R)[:, None, None], (R, P, k))
    votes = jnp.zeros((R, L, 4), jnp.int32)
    scatter_pos = jnp.where(can_vote[..., None], pos[None, :, :], L)
    votes = votes.at[read_id, scatter_pos, bases.astype(jnp.int32)].add(
        1, mode="drop")

    best = jnp.argmax(votes, axis=-1).astype(jnp.uint8)
    vote_total = jnp.sum(votes, axis=-1)
    vote_max = jnp.max(votes, axis=-1)
    # adopt the majority base only with unambiguous support
    decided = (vote_max * 2 > vote_total) & (vote_total > 0)
    in_read = jnp.arange(L)[None, :] < lengths[:, None]
    was_valid = codes < dna.INVALID_CODE
    out = jnp.where(decided & in_read, best, codes)
    out = jnp.where(in_read, out, codes)
    changed = jnp.sum((out != codes) & was_valid & in_read)
    return CorrectionResult(out, changed.astype(jnp.int32),
                            jnp.sum(clusters.solid.astype(jnp.int32)))


def correct_reads(codes, lengths, k: int = 21, max_iterations: int = 2,
                  center_ratio: float = 10.0, quals=None):
    """Iterative BayesHammer-style correction (main loop,
    projects/hammer/main.cpp:55): count -> cluster -> correct until no
    changes or max_iterations.

    With ``quals`` (raw phred+33), solidity uses quality mass instead of
    raw counts (kmer_stat.hpp's quality statistic): error k-mers built
    from miscalled bases fall below the threshold even when their raw
    count would pass.

    Returns (corrected_codes np.ndarray, stats dict).
    """
    import jax as _jax
    codes = jnp.asarray(codes)
    lengths = jnp.asarray(lengths)
    if quals is not None:
        quals = jnp.asarray(quals)
    total_changed = 0
    stats = {}
    for it in range(max_iterations):
        if quals is not None:
            table, qweight = counter.count_kmers_quality(
                codes, lengths, quals, k)
            cluster_counts = jnp.round(qweight).astype(jnp.int32)
        else:
            table = counter.count_kmers(codes, lengths, k)
            cluster_counts = table.counts
        ginfo = coverage_model.fit_coverage_model(
            np.asarray(cluster_counts[:int(table.num)]))
        good_thr = max(ginfo.ec_bound, 2.0)
        clusters = cluster_kmers(
            table.kmers, cluster_counts, table.num, k,
            jnp.int32(int(good_thr)), jnp.float32(center_ratio))
        res = correct_batch(codes, lengths, table, clusters, k)
        changed = int(res.changed_bases)
        total_changed += changed
        stats = {"iterations": it + 1, "changed_bases": total_changed,
                 "solid_kmers": int(res.solid_kmers),
                 "good_threshold": good_thr}
        codes = res.codes
        if changed == 0:
            break
    return np.asarray(codes), stats
