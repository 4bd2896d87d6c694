"""Batch read-to-graph mapping.

TPU-native replacement of ``BasicSequenceMapper``/``SequenceMapperNotifier``
(modules/alignment/sequence_mapper.hpp:288,
sequence_mapper_notifier.hpp:25-100): instead of an OpenMP loop handing
each read to listeners, ALL reads map at once — every read k-mer is
binary-searched in the edge k-mer index, giving per-k-mer
(oriented edge, implied read-start offset) votes; a per-read reduction
picks the winning alignment. Consumers (paired info, coverage, gap
closing) are plain array reductions over the result.

Conventions:
- oriented edge id = 2*edge + (0 if the read aligns to the edge's stored
  orientation else 1);
- ``start``: offset of read base 0 in the oriented edge's coordinates
  (may be negative if the read hangs off the edge start).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import dna, kmer, segments
from .index import EdgeKmerIndex


class ReadMapping(NamedTuple):
    """Per-read winning alignment (one (edge, start) per read)."""
    oriented_edge: jax.Array  # (R,) int32; 2*edge + rc-bit
    start: jax.Array          # (R,) int32 read-base-0 offset in oriented edge
    votes: jax.Array          # (R,) int32 supporting k-mer count
    mapped: jax.Array         # (R,) bool


@functools.partial(jax.jit, static_argnames=("k",))
def map_kmers(index: EdgeKmerIndex, codes: jax.Array, lengths: jax.Array,
              k: int):
    """Per-position mapping of every read k-mer.

    Returns (oriented_edge (R, P), start (R, P), found (R, P)).
    """
    kmers, valid = kmer.extract_kmers(codes, lengths, k)
    canon, read_fwd = dna.canonicalize_kmers(kmers, k)
    R, P, W = canon.shape
    flat = canon.reshape(-1, W)
    row = segments.searchsorted_rows(index.kmers, flat).reshape(R, P)
    found = (row < index.num) & valid
    safe = jnp.where(found, row, 0)
    edge = index.edge[safe]
    off = index.offset[safe]
    edge_fwd = index.is_fwd[safe]
    same = read_fwd == edge_fwd  # read orientation matches edge orientation

    # Edge length needed for rc-coordinate transform; fetch via index rows'
    # edge ids — callers pass the graph's seq_len through the closure-free
    # API below instead. Here we return raw (edge, off, same) parts.
    return edge, off, same, found


@jax.jit
def normalize_mapping(m: ReadMapping, conj: jax.Array) -> ReadMapping:
    """Rewrite rc-orientation hits (oid 2e+1) as forward hits on the
    conjugate edge (oid 2*conj[e]): the conjugate edge's sequence IS the
    reverse complement, so offsets carry over unchanged. After this, all
    oriented ids are even and pair-info/path-extension can key on plain
    edge ids."""
    e = m.oriented_edge // 2
    rc = (m.oriented_edge % 2) == 1
    safe_e = jnp.maximum(e, 0)
    e2 = jnp.where(rc, conj[safe_e], e)
    oe = jnp.where(m.oriented_edge >= 0, 2 * e2, -1)
    return m._replace(oriented_edge=oe)


@functools.partial(jax.jit, static_argnames=("k",))
def map_reads(index: EdgeKmerIndex, seq_len: jax.Array, codes: jax.Array,
              lengths: jax.Array, k: int) -> ReadMapping:
    """Winning (oriented edge, start) per read by k-mer majority vote."""
    edge, off, same, found = map_kmers(index, codes, lengths, k)
    R, P = found.shape
    pos = jnp.arange(P)[None, :]

    elen = seq_len[edge]
    # start of read base 0 in oriented-edge coordinates
    start_fwd = off - pos
    start_rc = (elen - index.k - off) - pos
    oedge = 2 * edge + jnp.where(same, 0, 1)
    start = jnp.where(same, start_fwd, start_rc)

    # majority vote per read over (oedge, start) pairs: sort rows of
    # (read, oedge, start) and take the longest run per read.
    read_id = jnp.broadcast_to(jnp.arange(R)[:, None], (R, P))
    keys = jnp.stack([
        read_id.reshape(-1).astype(jnp.uint32),
        oedge.reshape(-1).astype(jnp.uint32),
        (start.reshape(-1) + jnp.int32(1 << 20)).astype(jnp.uint32),
    ], axis=1)
    fvalid = found.reshape(-1)
    skeys, _, svalid = segments.sort_by_key_rows(keys, (), fvalid)
    uniq, counts, gid, num_unique = segments.unique_counts(skeys, svalid)

    # winner per read = unique row with max count
    N = uniq.shape[0]
    urow_read = uniq[:, 0].astype(jnp.int32)
    in_range = jnp.arange(N) < num_unique
    urow_read = jnp.where(in_range, urow_read, R)
    best = jnp.zeros((R,), jnp.int32).at[urow_read].max(
        counts.astype(jnp.int32), mode="drop")
    is_best = in_range & (counts == best[jnp.minimum(urow_read, R - 1)])
    # ambiguity: two distinct placements tie for best (reads fully inside
    # a repeat copy) — such reads must not feed paired info with a
    # spurious placement (the reference maps them as non-unique and its
    # weight counters ignore them)
    n_best = jnp.zeros((R,), jnp.int32).at[
        jnp.where(is_best, urow_read, R)].add(1, mode="drop")
    unambiguous = n_best <= 1
    # deterministic tie-break: first (lexicographically smallest) wins
    first_best = jnp.full((R,), N, jnp.int32).at[
        jnp.where(is_best, urow_read, R)].min(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    got = first_best < N
    fb = jnp.minimum(first_best, N - 1)
    oe = uniq[fb, 1].astype(jnp.int32)
    st = uniq[fb, 2].astype(jnp.int32) - (1 << 20)
    votes = jnp.where(got, best, 0)
    return ReadMapping(
        oriented_edge=jnp.where(got, oe, -1),
        start=jnp.where(got, st, 0),
        votes=votes,
        mapped=got & (votes > 0) & unambiguous,
    )
