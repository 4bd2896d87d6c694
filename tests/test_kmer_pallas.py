"""Pallas fused extract+canonicalize kernel parity (interpret mode)."""

import numpy as np
import pytest
import jax

from spades_for_blackbird_tpu.ops import dna, kmer as kmer_jnp, kmer_pallas


@pytest.mark.parametrize("k", [21, 33])
def test_fused_kernel_matches_jnp(k):
    rng = np.random.default_rng(k)
    R, L = 16, 100
    codes = rng.integers(0, 4, (R, L), dtype=np.uint8)
    codes[3, 50] = 4  # an N
    lengths = np.full((R,), L, dtype=np.int32)
    lengths[5] = 60
    import jax.numpy as jnp
    c1, v1 = kmer_pallas.extract_canonical_fused(
        jnp.asarray(codes), jnp.asarray(lengths), k, interpret=True)
    c2, v2, _ = kmer_jnp.extract_canonical_kmers(
        jnp.asarray(codes), jnp.asarray(lengths), k)
    v1, v2 = np.asarray(v1), np.asarray(v2)
    assert (v1 == v2).all()
    c1, c2 = np.asarray(c1), np.asarray(c2)
    assert (c1[v1] == c2[v2]).all()
