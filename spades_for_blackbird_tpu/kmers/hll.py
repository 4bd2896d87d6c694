"""HyperLogLog k-mer cardinality estimation on device.

Replaces the reference's HLL (common/adt/hll.hpp:11, used for k-mer
cardinality estimates via utils/kmer_counting.hpp:168-256 and the
spades-kmer-estimating tool, projects/kmercount/kmer_estimating.cpp:61):
register updates are one scatter-max over the hashed k-mer stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import kmer as kmer_ops
from ..parallel.kmer_exchange import kmer_hash

_PRECISION = 12  # 4096 registers, ~1.6% relative error
_M = 1 << _PRECISION


@functools.partial(jax.jit, static_argnames=("k",))
def hll_registers(codes: jax.Array, lengths: jax.Array, k: int) -> jax.Array:
    """HLL registers (M,) uint32 from a read batch's canonical k-mers."""
    canon, valid, _ = kmer_ops.extract_canonical_kmers(codes, lengths, k)
    W = canon.shape[-1]
    h = kmer_hash(canon.reshape(-1, W))
    valid = valid.reshape(-1)
    reg = (h & jnp.uint32(_M - 1)).astype(jnp.int32)
    rest = h >> jnp.uint32(_PRECISION)
    # rank = leading-zero count of the remaining 20 bits + 1
    width = 32 - _PRECISION
    rank = jnp.clip(width - jnp.ceil(
        jnp.log2(rest.astype(jnp.float32) + 1)).astype(jnp.int32) + 1,
        1, width + 1)
    # exact: position of highest set bit
    hb = jnp.floor(jnp.log2(jnp.maximum(rest, 1).astype(jnp.float32))
                   ).astype(jnp.int32)
    rank = jnp.where(rest == 0, width + 1, width - hb)
    reg = jnp.where(valid, reg, _M)
    return jnp.zeros((_M,), jnp.uint32).at[reg].max(
        rank.astype(jnp.uint32), mode="drop")


def merge_registers(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.maximum(a, b)


def estimate(registers) -> float:
    """Standard HLL estimate with small/large range corrections."""
    import numpy as np
    regs = np.asarray(registers, dtype=np.float64)
    m = float(_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs))
    zeros = float(np.sum(regs == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)  # linear counting
    return float(e)


def estimate_kmer_cardinality(codes, lengths, k: int) -> float:
    return estimate(hll_registers(jnp.asarray(codes),
                                  jnp.asarray(lengths), k))
