"""Hierarchical bitonic sorter correctness (interpret mode, small tiles)."""

import numpy as np
import jax.numpy as jnp
import pytest


def _check(n, log_tile, seed, dup=None):
    from spades_for_blackbird_tpu.ops import sort_pallas
    rng = np.random.default_rng(seed)
    if dup:
        hi = rng.integers(0, dup, n, dtype=np.uint32)
        lo = rng.integers(0, dup, n, dtype=np.uint32)
    else:
        hi = rng.integers(0, 2**32, n, dtype=np.uint32)
        lo = rng.integers(0, 2**32, n, dtype=np.uint32)
    sh, sl = sort_pallas.bitonic_sort_pairs(
        jnp.asarray(hi), jnp.asarray(lo), log_tile=log_tile,
        interpret=True)
    sh, sl = np.asarray(sh), np.asarray(sl)
    packed = hi.astype(np.uint64) << 32 | lo.astype(np.uint64)
    expect = np.sort(packed)
    got = sh.astype(np.uint64) << 32 | sl.astype(np.uint64)
    np.testing.assert_array_equal(got, expect)


def test_single_tile():
    _check(1 << 10, 10, 0)


def test_multi_tile():
    _check(1 << 13, 10, 1)


def test_many_tiles_with_duplicates():
    _check(1 << 13, 10, 2, dup=64)


def test_two_tiles():
    _check(1 << 11, 10, 3)
