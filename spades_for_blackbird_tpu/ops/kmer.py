"""Vectorized k-mer extraction from packed read tensors.

Replaces the reference's streaming rolling-hash k-mer splitters
(assembler/src/common/utils/kmer_mph/kmer_splitters.hpp:19-178 and the
``Seq::operator<<`` append idiom): instead of a per-read scalar loop, we
compute, for every read in a batch at once, the packed k-mer word tensor for
every window position via shifted adds and gathers — pure VPU work with
static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import dna


def sliding_words(codes: jax.Array) -> jax.Array:
    """(R, L) codes -> (R, L) uint32 where out[:, i] packs bases i..i+15.

    Bases past the end of the row are treated as 0 (A); callers mask
    validity separately.
    """
    R, L = codes.shape
    padded = jnp.pad(codes, ((0, 0), (0, dna.BASES_PER_WORD)),
                     constant_values=0)
    c = (padded.astype(jnp.uint32) & jnp.uint32(3))
    out = jnp.zeros((R, L), dtype=jnp.uint32)
    for j in range(dna.BASES_PER_WORD):
        shift = jnp.uint32((dna.BASES_PER_WORD - 1 - j) * 2)
        out = out | (c[:, j:j + L] << shift)
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def extract_kmers(codes: jax.Array, lengths: jax.Array, k: int
                  ) -> tuple[jax.Array, jax.Array]:
    """All k-mers of a read batch.

    Args:
      codes: (R, L) uint8 base codes, INVALID_CODE for N/padding.
      lengths: (R,) int32 actual read lengths.
      k: k-mer size (static).

    Returns:
      kmers: (R, P, W) uint32 packed k-mer words, P = L - k + 1 window
        positions per read.
      valid: (R, P) bool — window fits in the read and contains no N.
    """
    R, L = codes.shape
    if k > L:
        raise ValueError(f"k={k} > read length {L}")
    P = L - k + 1
    W = dna.words_per_kmer(k)

    packed = sliding_words(codes)  # (R, L)

    pos = jnp.arange(P)
    word_off = jnp.arange(W) * dna.BASES_PER_WORD
    idx = pos[:, None] + word_off[None, :]          # (P, W)
    kmers = packed[:, idx]                           # (R, P, W)

    last_bases = k - (W - 1) * dna.BASES_PER_WORD
    if last_bases < dna.BASES_PER_WORD:
        mask = jnp.uint32(0xFFFFFFFF) << jnp.uint32(
            (dna.BASES_PER_WORD - last_bases) * 2)
        kmers = kmers.at[:, :, W - 1].set(kmers[:, :, W - 1] & mask)

    invalid = (codes >= dna.INVALID_CODE).astype(jnp.int32)
    cs = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.int32), jnp.cumsum(invalid, axis=1)], axis=1)
    window_invalid = (cs[:, pos + k] - cs[:, pos]) > 0
    in_range = pos[None, :] <= (lengths[:, None] - k)
    valid = in_range & ~window_invalid
    return kmers, valid


@functools.partial(jax.jit, static_argnames=("k",))
def extract_canonical_kmers(codes: jax.Array, lengths: jax.Array, k: int
                            ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Canonical k-mers of a read batch.

    Returns (canon (R, P, W), valid (R, P), is_forward (R, P)).
    """
    kmers, valid = extract_kmers(codes, lengths, k)
    canon, is_fwd = dna.canonicalize_kmers(kmers, k)
    return canon, valid, is_fwd
