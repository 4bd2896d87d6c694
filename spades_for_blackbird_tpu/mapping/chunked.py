"""Chunked read-to-graph mapping: fixed-shape chunks, host concatenation.

The reference streams reads through mappers in binary-reader chunks
(common/alignment/sequence_mapper_notifier.hpp:66 ProcessLibrary over
chunked readers); the equivalent here slices the read batch into
fixed-size chunks so each `map_reads` call compiles once and its (R, P)
k-mer-vote intermediates stay bounded regardless of library size —
a 28M-read library must never materialize a 2.8G-row sort.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import mapper

# Default chunk: 2^16 reads x ~100bp -> ~6.5M votes per chunk, well
# within one chip's HBM next to the edge index.
DEFAULT_CHUNK = 1 << 16


def _pad_chunk(codes, lengths, lo, hi, chunk):
    c = codes[lo:hi]
    l = lengths[lo:hi]
    if hi - lo < chunk:
        pad = chunk - (hi - lo)
        c = jnp.pad(c, ((0, pad), (0, 0)))
        l = jnp.pad(l, (0, pad))
    return c, l


def map_reads_chunked(index, seq_len, codes, lengths, k: int,
                      chunk: int = DEFAULT_CHUNK) -> mapper.ReadMapping:
    """`mapper.map_reads` over fixed-size chunks; one compile, bounded
    intermediates. Returns host-concatenated per-read fields."""
    codes = jnp.asarray(codes)
    lengths = jnp.asarray(lengths)
    R = codes.shape[0]
    if R <= chunk:
        return mapper.map_reads(index, seq_len, codes, lengths, k)
    # chunk outputs stay ON DEVICE (device concat): a per-chunk host
    # round trip of the (R,) result columns costs minutes per 10 MB on
    # a tunneled chip
    fields = {"oriented_edge": [], "start": [], "votes": [], "mapped": []}
    for lo in range(0, R, chunk):
        hi = min(lo + chunk, R)
        c, l = _pad_chunk(codes, lengths, lo, hi, chunk)
        m = mapper.map_reads(index, seq_len, c, l, k)
        n = hi - lo
        for name in fields:
            fields[name].append(getattr(m, name)[:n])
    return mapper.ReadMapping(
        **{name: jnp.concatenate(v) for name, v in fields.items()})


def map_reads_multi_chunked(index, seq_len, codes, lengths, k: int,
                            max_placements: int = 4, min_votes: int = 2,
                            chunk: int = DEFAULT_CHUNK
                            ) -> mapper.ChainMapping:
    """`mapper.map_reads_multi` over fixed-size chunks."""
    codes = jnp.asarray(codes)
    lengths = jnp.asarray(lengths)
    R = codes.shape[0]
    if R <= chunk:
        return mapper.map_reads_multi(index, seq_len, codes, lengths, k,
                                      max_placements=max_placements,
                                      min_votes=min_votes)
    fields = {"oriented_edge": [], "start": [], "votes": [],
              "chain_len": [], "mapped": []}
    for lo in range(0, R, chunk):
        hi = min(lo + chunk, R)
        c, l = _pad_chunk(codes, lengths, lo, hi, chunk)
        m = mapper.map_reads_multi(index, seq_len, c, l, k,
                                   max_placements=max_placements,
                                   min_votes=min_votes)
        n = hi - lo
        for name in fields:
            fields[name].append(getattr(m, name)[:n])
    return mapper.ChainMapping(
        **{name: jnp.concatenate(v) for name, v in fields.items()})
