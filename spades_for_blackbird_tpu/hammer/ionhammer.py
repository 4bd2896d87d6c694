"""IonTorrent homopolymer-space read correction (IonHammer equivalent).

TPU-native counterpart of projects/ionhammer (8.9k LoC: HKMer counting,
gamma-Poisson run-length model, SW read corrector): IonTorrent's dominant
error mode is homopolymer run-length miscalls, so correction happens in
homopolymer-compressed space:

1. compress each read to (base, run_length) pairs (vectorized segmented
   reduction);
2. count k-mers over the compressed base string and accumulate per-slot
   run-length sums — giving, for every solid compressed k-mer, the
   consensus run length at each of its k positions (the cheap-prior
   stand-in for the reference's gamma-Poisson posterior);
3. rewrite each read's run lengths to the consensus where solid k-mers
   agree, then decompress.
"""

from __future__ import annotations

import numpy as np

from ..ops import dna


def hp_compress(codes: np.ndarray, lengths: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(R, L) codes -> (bases (R, L), runs (R, L), comp_lengths (R,)).

    Compressed rows are left-aligned and INVALID-padded.
    """
    R, L = codes.shape
    bases = np.full((R, L), dna.INVALID_CODE, np.uint8)
    runs = np.zeros((R, L), np.int32)
    clens = np.zeros(R, np.int32)
    for r in range(R):
        n = int(lengths[r])
        j = -1
        prev = -1
        for i in range(n):
            c = int(codes[r, i])
            if c >= dna.INVALID_CODE:
                break
            if c != prev:
                j += 1
                bases[r, j] = c
                runs[r, j] = 0
                prev = c
            runs[r, j] += 1
        clens[r] = j + 1
    return bases, runs, clens


def hp_decompress(bases: np.ndarray, runs: np.ndarray, clens: np.ndarray,
                  out_width: int) -> tuple[np.ndarray, np.ndarray]:
    R = bases.shape[0]
    codes = np.full((R, out_width), dna.INVALID_CODE, np.uint8)
    lengths = np.zeros(R, np.int32)
    for r in range(R):
        pos = 0
        for j in range(int(clens[r])):
            rl = int(runs[r, j])
            end = min(pos + rl, out_width)
            codes[r, pos:end] = bases[r, j]
            pos = end
            if pos >= out_width:
                break
        lengths[r] = pos
    return codes, lengths


def correct_reads_ion(codes, lengths, k: int = 13,
                      min_count: int = 3) -> tuple[np.ndarray, np.ndarray, dict]:
    """Correct homopolymer run lengths by solid-HK-mer consensus.

    Returns (codes, lengths, stats) — widths can change since run lengths
    do.
    """
    import jax.numpy as jnp
    from ..kmers import counter
    from ..ops import kmer as kmer_ops, segments

    codes = np.asarray(codes)
    lengths = np.asarray(lengths)
    bases, runs, clens = hp_compress(codes, lengths)

    jb = jnp.asarray(bases)
    jl = jnp.asarray(clens)
    # count canonical compressed k-mers
    table = counter.count_kmers(jb, jl, k)

    # per-(kmer-row, slot) run-length sums. Orientation: accumulate in
    # the read's orientation mapped through canonical form.
    kmers, valid = kmer_ops.extract_kmers(jb, jl, k)
    canon, is_fwd = dna.canonicalize_kmers(kmers, k)
    R, P, W = canon.shape
    row = segments.searchsorted_rows(
        table.kmers, canon.reshape(-1, W)).reshape(R, P)
    found = np.asarray((row < table.num) & valid)
    rown = np.asarray(row)
    fwd = np.asarray(is_fwd)

    N = table.capacity
    rl_sum = np.zeros((N, k), np.int64)
    rl_cnt = np.zeros((N, k), np.int64)
    win = np.lib.stride_tricks.sliding_window_view(runs, k, axis=1)
    for r in range(R):
        cl = int(clens[r])
        for p in np.nonzero(found[r])[0]:
            w = win[r, p].copy()
            # a read's first/last homopolymer runs are truncated by the
            # read boundary — exclude them from run-length statistics
            # (the reference's flank handling in ionhammer)
            m = np.ones(k, np.int64)
            if p == 0:
                m[0] = 0
            if p + k == cl:
                m[-1] = 0
            if not fwd[r, p]:
                w = w[::-1]
                m = m[::-1]
            rl_sum[rown[r, p]] += w * m
            rl_cnt[rown[r, p]] += m

    counts = np.asarray(table.counts)
    solid = counts >= min_count
    with np.errstate(divide="ignore", invalid="ignore"):
        consensus = np.rint(rl_sum / np.maximum(rl_cnt, 1)).astype(np.int32)

    # vote per read compressed-position (flank positions keep their
    # observed truncated lengths — their true length is unknowable)
    vote_sum = np.zeros_like(runs, dtype=np.int64)
    vote_cnt = np.zeros_like(runs, dtype=np.int64)
    for r in range(R):
        for p in np.nonzero(found[r])[0]:
            rr = rown[r, p]
            if not solid[rr] or rl_cnt[rr].min() == 0:
                continue
            cons = consensus[rr]
            if not fwd[r, p]:
                cons = cons[::-1]
            vote_sum[r, p:p + k] += cons
            vote_cnt[r, p:p + k] += 1

    new_runs = runs.copy()
    interior = np.zeros_like(runs, dtype=bool)
    for r in range(R):
        cl = int(clens[r])
        if cl > 2:
            interior[r, 1:cl - 1] = True
    has = (vote_cnt > 0) & interior
    new_runs[has] = np.rint(vote_sum[has] / vote_cnt[has]).astype(np.int32)
    new_runs = np.maximum(new_runs, np.where(
        np.arange(runs.shape[1])[None, :] < clens[:, None], 1, 0))

    changed = int(np.sum((new_runs != runs) & has))
    out_width = int((new_runs.sum(axis=1)).max()) if len(new_runs) else 0
    out_codes, out_lengths = hp_decompress(bases, new_runs, clens,
                                           max(out_width, codes.shape[1]))
    return out_codes, out_lengths, {"changed_runs": changed,
                                    "solid_hkmers": int(solid.sum())}
