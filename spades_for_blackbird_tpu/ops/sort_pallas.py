"""Hierarchical bitonic sort of (hi, lo) u32 key pairs on TPU.

The "beat the XLA sort" engine for k-mer counting (BASELINE.md north
star; replaces the reference's per-bucket ``libcxx::sort`` inside the
disk counter, utils/kmer_mph/kmer_index_builder.hpp:220-366):

- **Tile phase (Pallas)**: each 2^LOG_TILE-element tile is sorted
  entirely in VMEM by the classic bitonic network, expressed as
  XOR-partner compare-exchanges.  A partner at distance 2^j is reached
  with two circular rolls (lane rolls for j < 7, sublane rolls above)
  and a parity select — every stage is pure VPU work on resident data,
  avoiding the per-stage HBM round trips that make the XLA sort
  memory-bound.
- **Cross-tile phase (XLA)**: the remaining bitonic stages have
  distances that are whole multiples of the tile size, so the
  compare-exchange pairs tiles elementwise — plain ``jnp`` min/max
  selects that XLA fuses into single HBM passes; the closing sub-tile
  stages of each merge level run through the Pallas kernel in "merge"
  mode (direction constant per tile, given by the level bit).

The network sorts ascending by the lexicographic (hi, lo) pair; equal
keys stay grouped (bitonic is not stable, which counting does not need).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LOG_TILE = 18            # 2^18 elements per VMEM tile (default)
LANES = 128
LOG_LANES = 7


def _pair_gt(ah, al, bh, bl):
    return (ah > bh) | ((ah == bh) & (al > bl))


def _select_new(hi, lo, ph, plo, want_lo):
    """Keep min(self, partner) where want_lo, else max.

    ``take_partner`` is combined with logical ops, not an i1-valued
    select — Mosaic rejects ``where(i1, i1, i1)`` ("Unsupported target
    bitwidth for truncation")."""
    gt = _pair_gt(hi, lo, ph, plo)     # self > partner
    lt = _pair_gt(ph, plo, hi, lo)     # partner > self
    take_partner = (want_lo & gt) | (~want_lo & lt)
    return (jnp.where(take_partner, ph, hi),
            jnp.where(take_partner, plo, lo))


def _cmpx(hi, lo, j, asc, rows):
    """One compare-exchange substage at distance 2^j inside a
    (rows, LANES) tile.  ``asc``: True where the element's bitonic run
    is ascending."""
    from jax.experimental.pallas import tpu as pltpu
    if j < LOG_LANES:
        axis, dist, bit_axis, bit = 1, 1 << j, 1, j
    else:
        axis, dist, bit_axis, bit = 0, 1 << (j - LOG_LANES), 0, \
            j - LOG_LANES
    size = LANES if axis == 1 else rows
    # roll only takes non-negative shifts: -d == size - d (circular)
    ph_m = pltpu.roll(hi, shift=size - dist, axis=axis)  # value at i + d
    ph_p = pltpu.roll(hi, shift=dist, axis=axis)         # value at i - d
    pl_m = pltpu.roll(lo, shift=size - dist, axis=axis)
    pl_p = pltpu.roll(lo, shift=dist, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), bit_axis)
    is_upper = ((idx >> bit) & 1) == 1
    ph = jnp.where(is_upper, ph_p, ph_m)
    plo = jnp.where(is_upper, pl_p, pl_m)
    want_lo = asc ^ is_upper
    return _select_new(hi, lo, ph, plo, want_lo)


def _flat_index(rows):
    return (jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1))


def _tile_sort_kernel(hi_ref, lo_ref, oh_ref, ol_ref, *, log_tile):
    """Full bitonic sort of one tile (stages s = 0..LOG_TILE-1).  The
    direction bit of the last stage is the tile parity, so consecutive
    tiles come out ascending/descending alternately — exactly the
    bitonic precondition for the cross-tile merge levels."""
    import jax.experimental.pallas as pl
    rows = (1 << log_tile) // LANES
    hi = hi_ref[:]
    lo = lo_ref[:]
    t = pl.program_id(0)
    flat = _flat_index(rows)
    for s in range(log_tile):
        s_bit = s + 1
        if s_bit < log_tile:
            asc = ((flat >> s_bit) & 1) == 0
        else:
            asc = jnp.broadcast_to((t & 1) == 0, (rows, LANES))
        for j in range(s, -1, -1):
            hi, lo = _cmpx(hi, lo, j, asc, rows)
    oh_ref[:] = hi
    ol_ref[:] = lo


def _tile_merge_kernel(hi_ref, lo_ref, dir_ref, oh_ref, ol_ref, *,
                       log_tile):
    """Closing sub-tile stages (j = log_tile-1..0) of one cross-tile
    merge level; direction is constant per tile.  ``dir_ref`` holds the
    whole per-tile direction vector in SMEM (a (1,1) SMEM block fails
    Mosaic's block-shape divisibility rule, so the full array is the
    block and the grid index selects the row)."""
    import jax.experimental.pallas as pl
    rows = (1 << log_tile) // LANES
    hi = hi_ref[:]
    lo = lo_ref[:]
    t = pl.program_id(0)
    asc = jnp.broadcast_to(dir_ref[t, 0] == 1, (rows, LANES))
    for j in range(log_tile - 1, -1, -1):
        hi, lo = _cmpx(hi, lo, j, asc, rows)
    oh_ref[:] = hi
    ol_ref[:] = lo


def _run_tile_sort(hi2, lo2, log_tile, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    rows = (1 << log_tile) // LANES
    T = hi2.shape[0] // rows
    return pl.pallas_call(
        functools.partial(_tile_sort_kernel, log_tile=log_tile),
        grid=(T,),
        in_specs=[pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),) * 2,
        out_shape=(jax.ShapeDtypeStruct(hi2.shape, jnp.uint32),) * 2,
        interpret=interpret,
    )(hi2, lo2)


def _run_tile_merge(hi2, lo2, dirs, log_tile, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    rows = (1 << log_tile) // LANES
    T = hi2.shape[0] // rows
    return pl.pallas_call(
        functools.partial(_tile_merge_kernel, log_tile=log_tile),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),) * 2,
        out_shape=(jax.ShapeDtypeStruct(hi2.shape, jnp.uint32),) * 2,
        interpret=interpret,
    )(hi2, lo2, dirs)


@functools.partial(jax.jit,
                   static_argnames=("log_tile", "interpret"))
def bitonic_sort_pairs(hi: jax.Array, lo: jax.Array,
                       log_tile: int = LOG_TILE,
                       interpret: bool = False):
    """Sort (hi, lo) u32 pairs ascending-lexicographic.

    N = hi.shape[0] must be a power of two >= 2^log_tile.  Returns
    sorted (hi, lo)."""
    N = hi.shape[0]
    tile = 1 << log_tile
    if N < tile or (N & (N - 1)) != 0:
        raise ValueError(f"N must be a pow2 >= {tile}, got {N}")
    n_tiles = N // tile
    log_n = N.bit_length() - 1

    hi2 = hi.reshape(-1, LANES)
    lo2 = lo.reshape(-1, LANES)
    hi2, lo2 = _run_tile_sort(hi2, lo2, log_tile, interpret)

    tile_idx = jnp.arange(n_tiles, dtype=jnp.int32)
    for s in range(log_tile, log_n):
        s_bit = s + 1
        if s_bit >= log_n:
            asc_tile = jnp.ones(n_tiles, bool)
        else:
            asc_tile = ((tile_idx >> (s_bit - log_tile)) & 1) == 0
        for j in range(s, log_tile - 1, -1):
            # cross-tile stage: pair tiles at distance 2^(j-log_tile);
            # elementwise within the pair, single fused HBM pass
            db = j - log_tile
            h3 = hi2.reshape(n_tiles, tile)
            l3 = lo2.reshape(n_tiles, tile)
            upper = ((tile_idx >> db) & 1) == 1
            partner = tile_idx ^ (1 << db)
            ph = h3[partner]
            plo = l3[partner]
            want_lo = asc_tile[:, None] ^ upper[:, None]
            h3, l3 = _select_new(h3, l3, ph, plo, want_lo)
            hi2 = h3.reshape(-1, LANES)
            lo2 = l3.reshape(-1, LANES)
        dirs = asc_tile.astype(jnp.int32).reshape(n_tiles, 1)
        hi2, lo2 = _run_tile_merge(hi2, lo2, dirs, log_tile, interpret)
    return hi2.reshape(-1), lo2.reshape(-1)
