"""Pallas TPU kernel: fused k-mer extraction + canonicalization.

The jnp path (ops/kmer.py) materializes several (R, P, W) intermediates in
HBM (packed windows, gathered k-mers, reverse complements); this kernel
streams a block of reads through VMEM once and emits canonical k-mer
words directly — one HBM read of the codes, one write of the canonical
table, all shifts/compares on the VPU.

STATUS: PRODUCTION on TPU — bit-exact on real v5e across k=21..127
after two Mosaic lowering hazards were isolated by minimized repros and
worked around in-kernel (see the comments in ``_kernel``): unaligned
lane slices feeding accumulation chains, and any intermediate whose lane
width is not a multiple of 128.  ``counter.count_kmers`` uses the
column-layout variant on the TPU backend (+11% end-to-end counting
throughput); the jnp path remains the reference implementation and the
CPU fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import dna, kmer as kmer_jnp

_LANE = 128


def _kernel(codes_ref, canon_ref, valid_ref, *, k, L, P, W, Ppad):
    from jax.experimental.pallas import tpu as pltpu

    raw = codes_ref[...].astype(jnp.int32)                  # (TR, Lpad)
    c = raw.astype(jnp.uint32) & jnp.uint32(3)
    inv32 = (raw >= dna.INVALID_CODE).astype(jnp.uint32)
    # Two v5e Mosaic lowering hazards, both bit-wrong on hardware yet
    # exact in the interpreter (minimized repros in round-1 notes):
    #   1. unaligned lane slices x[:, j:j+P] feeding an accumulation
    #      chain — worked around with pltpu.roll + aligned slices;
    #   2. ANY array whose lane width is not a multiple of 128 — all
    #      widths here (Lpad, Ppad) are therefore 128-multiples.
    # (v5e also lacks u8 vector compares; inputs are widened to int32.)
    # Rolls materialize full copies, so they are the traffic that counts:
    # binary doubling packs 16 bases in 4 rolls (vs 16) and ORs the
    # k-window invalid mask in log2(k)+popcount(k) rolls (vs k).
    BPW = dna.BASES_PER_WORD
    Lpad = c.shape[1]

    def rolled(x, s):
        return pltpu.roll(x, (-s) % Lpad, axis=1)

    # q packs bases i..i+15 of position i into bits 31..0 (big-endian):
    # doubling — q_2s[i] = q_s[i] | q_s[i+s] >> 2s
    q = c << jnp.uint32(30)
    span = 1
    while span < BPW:
        q = q | (rolled(q, span) >> jnp.uint32(2 * span))
        span *= 2

    # invalid-in-window mask over k consecutive bases: doubling powers
    # b_s, then cover k by its binary decomposition
    pows = []
    bb = inv32
    s = 1
    while s <= k:
        pows.append((s, bb))
        bb = bb | rolled(bb, s)
        s *= 2
    badm = None
    off = 0
    rem = k
    for s, arr in reversed(pows):
        if rem >= s:
            part = rolled(arr, off) if off else arr
            badm = part if badm is None else (badm | part)
            off += s
            rem -= s
    bad = badm[:, :Ppad] > jnp.uint32(0)

    last_bases = k - (W - 1) * BPW
    fwd = []
    for w in range(W):
        word = rolled(q, w * BPW)[:, :Ppad] if w else q[:, :Ppad]
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
def extract_canonical_cols(codes: jax.Array, lengths: jax.Array, k: int,
                           interpret: bool = False):
    """Fused extraction in word-major layout: returns
    ([word_w (R, P) u32 for w in range(W)], valid (R, P)) with NO
    transpose back to row-major — the counting engine sorts the columns
    directly (segments.count_sorted_cols), saving a full (R, P, W)
    interleave pass."""
    canon2d, valid, meta = _fused_raw(codes, lengths, k, interpret)
    R, P, W, Ppad = meta
    cols = [canon2d[:, w * Ppad:w * Ppad + P] for w in range(W)]
    return cols, valid


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def extract_canonical_fused(codes: jax.Array, lengths: jax.Array, k: int,
                            interpret: bool = False):
    """Drop-in for kmer.extract_canonical_kmers (canon, valid) — fused
    Pallas path on TPU, jnp fallback elsewhere (``interpret=True`` forces
    the Pallas path through the interpreter for CPU parity tests)."""
    backend = jax.default_backend()
    if backend not in ("tpu",) and not interpret:
        canon, valid, _ = kmer_jnp.extract_canonical_kmers(codes, lengths, k)
        return canon, valid
    canon2d, valid, meta = _fused_raw(codes, lengths, k, interpret)
    R, P, W, Ppad = meta
    canon = canon2d.reshape(R, W, Ppad).transpose(0, 2, 1)[:, :P]
    return canon, valid


def _fused_raw(codes: jax.Array, lengths: jax.Array, k: int,
               interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, L = codes.shape
    P = L - k + 1
    W = dna.words_per_kmer(k)

    TR = min(128, ((R + 7) // 8) * 8)
    Ppad = ((P + _LANE - 1) // _LANE) * _LANE
    # Lpad: roll wrap-around garbage must land past every real window —
    # need Lpad >= P + max(k, W*BPW); also a multiple of 128 (hazard 2)
    need = max(L, Ppad + max(k, W * dna.BASES_PER_WORD))
    Lpad = ((need + _LANE - 1) // _LANE) * _LANE
    # clamp the row tile so the block's VMEM footprint (input codes +
    # u32 canon + u8 valid, plus kernel scratch) stays well under the
    # 16 MB scoped-vmem budget even for long rows (contig windows,
    # long reads)
    row_bytes = Lpad + 4 * W * Ppad + Ppad
    budget = 6 << 20
    while TR > 8 and TR * row_bytes > budget:
        TR -= 8
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

    canon2d = canon[:R]
    valid = valid[:R, :P].astype(bool)
    in_range = jnp.arange(P)[None, :] <= (lengths[:, None] - k)
    return canon2d, valid & in_range, (R, P, W, Ppad)
