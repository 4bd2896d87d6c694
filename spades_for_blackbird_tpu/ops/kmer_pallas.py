"""Pallas TPU kernel: fused k-mer extraction + canonicalization.

The jnp path (ops/kmer.py) materializes several (R, P, W) intermediates in
HBM (packed windows, gathered k-mers, reverse complements); this kernel
streams a block of reads through VMEM once and emits canonical k-mer
words directly — one HBM read of the codes, one write of the canonical
table, all shifts/compares on the VPU.

STATUS (round 1): EXPERIMENTAL — bit-exact vs the jnp path under the
Pallas interpreter (tests/test_kmer_pallas.py), but the Mosaic-compiled
kernel produces mismatching canonical words on real v5e for a subset of
windows (validity plane is exact; suspected u32 shift/compare lowering or
layout issue — v5e also rejects u8 vector compares outright). The
production counting path therefore stays on the jnp implementation;
``extract_canonical_fused`` is only used explicitly. Revisit with a
newer Mosaic or a minimized repro next round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import dna, kmer as kmer_jnp

_LANE = 128


def _kernel(codes_ref, canon_ref, valid_ref, *, k, L, P, W, Ppad):
    raw = codes_ref[...].astype(jnp.int32)                  # (TR, Lpad)
    c = raw.astype(jnp.uint32) & jnp.uint32(3)
    invalid = raw >= dna.INVALID_CODE  # int32 cmp: v5e lacks u8 vector cmp
    TR = c.shape[0]
    BPW = dna.BASES_PER_WORD
    # width needed for packed windows so word w can slice [w*16, w*16+Ppad)
    Pw = Ppad + BPW * W

    # packed windows: p16[:, i] packs bases i..i+15 (zeros beyond); all
    # slices static so they lower to plain vector shifts
    p16 = jnp.zeros((TR, Pw), jnp.uint32)
    bad = jnp.zeros((TR, Ppad), jnp.bool_)
    for j in range(BPW):
        sl = c[:, j:j + Pw]
        p16 = p16 | (sl << jnp.uint32((BPW - 1 - j) * 2))
    for j in range(k):
        bad = bad | invalid[:, j:j + Ppad]

    last_bases = k - (W - 1) * BPW
    fwd = []
    for w in range(W):
        word = p16[:, w * BPW:w * BPW + Ppad]
        if w == W - 1 and last_bases < BPW:
            mask = jnp.uint32(0xFFFFFFFF) << jnp.uint32(
                (BPW - last_bases) * 2)
            word = word & mask
        fwd.append(word)

    # reverse complement of each (TR, Ppad) word set
    stackf = jnp.stack(fwd, axis=0)                  # (W, TR, Ppad)
    rev = _revcomp_words(stackf, k, W)
    # canonical select: lexicographic fwd vs rev
    lt = rev[W - 1] < stackf[W - 1]
    for w in range(W - 2, -1, -1):
        lt = (rev[w] < stackf[w]) | ((rev[w] == stackf[w]) & lt)
    canon = jnp.where(lt[None], rev, stackf)         # (W, TR, Ppad)

    # store 2D word-major (TR, W*Ppad): Mosaic handles 2D tiles reliably;
    # the caller reshapes/transposes to (R, P, W)
    canon_ref[...] = jnp.concatenate([canon[w] for w in range(W)], axis=1)
    valid_ref[...] = (~bad).astype(jnp.uint8)


def _revcomp_words(words, k, W):
    """(W, TR, P) packed words -> reverse complement, same layout."""
    rev_in = []
    for w in range(W):
        x = ~words[w]
        x = ((x & jnp.uint32(0x0000FFFF)) << 16) | \
            ((x & jnp.uint32(0xFFFF0000)) >> 16)
        x = ((x & jnp.uint32(0x00FF00FF)) << 8) | \
            ((x & jnp.uint32(0xFF00FF00)) >> 8)
        x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | \
            ((x & jnp.uint32(0xF0F0F0F0)) >> 4)
        x = ((x & jnp.uint32(0x33333333)) << 2) | \
            ((x & jnp.uint32(0xCCCCCCCC)) >> 2)
        rev_in.append(x)
    rev = [rev_in[W - 1 - w] for w in range(W)]
    pad_bits = (W * dna.BASES_PER_WORD - k) * 2
    if pad_bits:
        word_shift, bit_shift = divmod(pad_bits, 32)
        if word_shift:
            rev = rev[word_shift:] + [jnp.zeros_like(rev[0])] * word_shift
        if bit_shift:
            out = []
            for w in range(W):
                hi = rev[w] << jnp.uint32(bit_shift)
                lo = (rev[w + 1] >> jnp.uint32(32 - bit_shift)) \
                    if w + 1 < W else jnp.zeros_like(rev[w])
                out.append(hi | lo)
            rev = out
        last_bases = k - (W - 1) * dna.BASES_PER_WORD
        if last_bases < dna.BASES_PER_WORD:
            mask = jnp.uint32(0xFFFFFFFF) << jnp.uint32(
                (dna.BASES_PER_WORD - last_bases) * 2)
            rev[W - 1] = rev[W - 1] & mask
    return jnp.stack(rev, axis=0)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def extract_canonical_fused(codes: jax.Array, lengths: jax.Array, k: int,
                            interpret: bool = False):
    """Drop-in for kmer.extract_canonical_kmers (canon, valid) — fused
    Pallas path on TPU, jnp fallback elsewhere (``interpret=True`` forces
    the Pallas path through the interpreter for CPU parity tests)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, L = codes.shape
    P = L - k + 1
    W = dna.words_per_kmer(k)
    backend = jax.default_backend()
    if backend not in ("tpu",) and not interpret:
        canon, valid, _ = kmer_jnp.extract_canonical_kmers(codes, lengths, k)
        return canon, valid

    TR = 8
    Ppad = ((P + _LANE - 1) // _LANE) * _LANE
    Lpad = Ppad + dna.BASES_PER_WORD * (W + 1)
    Rpad = ((R + TR - 1) // TR) * TR
    codes_p = jnp.full((Rpad, Lpad), dna.INVALID_CODE, jnp.uint8)
    codes_p = codes_p.at[:R, :L].set(codes)

    canon, valid = pl.pallas_call(
        functools.partial(_kernel, k=k, L=Lpad, P=P, W=W, Ppad=Ppad),
        grid=(Rpad // TR,),
        in_specs=[pl.BlockSpec((TR, Lpad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((TR, W * Ppad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, Ppad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rpad, W * Ppad), jnp.uint32),
            jax.ShapeDtypeStruct((Rpad, Ppad), jnp.uint8),
        ),
        interpret=interpret,
    )(codes_p)

    canon = canon.reshape(Rpad, W, Ppad).transpose(0, 2, 1)[:R, :P]
    valid = valid[:R, :P].astype(bool)
    in_range = jnp.arange(P)[None, :] <= (lengths[:, None] - k)
    return canon, valid & in_range
