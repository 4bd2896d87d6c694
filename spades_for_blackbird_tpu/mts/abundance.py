"""Multi-sample k-mer multiplicity and contig abundance profiles.

Counterparts of the reference mts tools:

- :func:`multiplicity_profiles` — ``kmer_multiplicity_counter``
  (projects/mts/kmer_multiplicity_counter.cpp): one canonical k-mer
  table per sample (counted on device, kmers/counter.py), merged into a
  (k-mer -> per-sample multiplicity) matrix with a single sorted-union
  pass (the KMC-merge replacement).
- :func:`contig_abundance` — ``contig_abundance_counter``
  (projects/mts/contig_abundance_counter.cpp + contig_abundance.cpp):
  per-contig per-sample abundance = median k-mer multiplicity of the
  contig's k-mers (the reference's default "median" ProfileCounter).
- profile save/load in .npz (replaces the reference's KMC database +
  custom binary `kmer_mult` format).
"""

from __future__ import annotations

import numpy as np

from ..kmers.counter import KmerTable, count_kmers
from ..ops import dna, kmer as kmer_ops, segments


def multiplicity_profiles(sample_batches: list[tuple], k: int,
                          min_mult: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Count canonical k-mers of each sample and join into one profile
    matrix. ``sample_batches``: list of (codes, lengths).

    Returns (kmers (D, W) uint32 sorted rows, mult (D, S) int32), keeping
    k-mers whose *total* multiplicity is >= min_mult.
    """
    import jax.numpy as jnp

    tables = [count_kmers(jnp.asarray(c), jnp.asarray(l), k)
              for c, l in sample_batches]
    S = len(tables)
    kms = [np.asarray(t.kmers)[:int(t.num)] for t in tables]
    cts = [np.asarray(t.counts)[:int(t.num)] for t in tables]
    all_k = np.concatenate(kms, axis=0)
    all_c = np.concatenate(cts)
    all_s = np.concatenate([np.full(len(c), i, np.int32)
                            for i, c in enumerate(cts)])
    # sorted union join (same idiom as counter.merge_tables)
    order = np.lexsort(tuple(all_k[:, w] for w in
                             range(all_k.shape[1] - 1, -1, -1)))
    sk = all_k[order]
    new = np.ones(len(sk), bool)
    if len(sk) > 1:
        new[1:] = (sk[1:] != sk[:-1]).any(axis=1)
    gid = np.cumsum(new) - 1
    D = int(gid[-1]) + 1 if len(gid) else 0
    kmers = sk[new]
    mult = np.zeros((D, S), np.int32)
    mult[gid, all_s[order]] = all_c[order]
    keep = mult.sum(axis=1) >= min_mult
    return kmers[keep], mult[keep]


def save_profiles(path: str, kmers: np.ndarray, mult: np.ndarray,
                  k: int) -> None:
    np.savez_compressed(path, kmers=kmers, mult=mult, k=np.int32(k))


def load_profiles(path: str):
    z = np.load(path)
    return z["kmers"], z["mult"], int(z["k"])


def _contig_kmer_rows(seqs: list[str], kmers: np.ndarray, k: int):
    """For each contig: indices of its canonical k-mers in ``kmers``
    (-1 = absent). Returns list of int arrays."""
    import jax.numpy as jnp
    if not seqs:
        return []
    codes, lengths = dna.encode_reads(seqs)
    canon, valid, _ = kmer_ops.extract_canonical_kmers(
        jnp.asarray(codes), jnp.asarray(lengths), k)
    W = canon.shape[-1]
    rows = segments.searchsorted_rows(jnp.asarray(kmers),
                                      canon.reshape(-1, W))
    rows = np.asarray(rows).reshape(canon.shape[0], -1)
    valid = np.asarray(valid)
    D = len(kmers)
    out = []
    canon_np = np.asarray(canon)
    for i in range(len(seqs)):
        r = rows[i][valid[i]]
        c = canon_np[i][valid[i]]
        ok = (r < D)
        # confirm actual equality (searchsorted returns insert pos)
        ok &= (kmers[np.minimum(r, D - 1)] == c).all(axis=1)
        rr = np.where(ok, r, -1)
        out.append(rr)
    return out


def contig_abundance(seqs: list[str], kmers: np.ndarray, mult: np.ndarray,
                     k: int, stat: str = "median") -> np.ndarray:
    """(C, S) abundance profiles; absent k-mers count as multiplicity 0
    (contig_abundance.cpp's behaviour for unseen k-mers)."""
    rows_per = _contig_kmer_rows(seqs, kmers, k)
    S = mult.shape[1]
    out = np.zeros((len(seqs), S), np.float32)
    for i, rr in enumerate(rows_per):
        if len(rr) == 0:
            continue
        m = np.zeros((len(rr), S), np.float32)
        has = rr >= 0
        m[has] = mult[rr[has]]
        out[i] = np.median(m, axis=0) if stat == "median" \
            else m.mean(axis=0)
    return out


def fragment_abundance(seq: str, kmers: np.ndarray, mult: np.ndarray,
                       k: int, frag_size: int) -> np.ndarray:
    """Per-fragment profiles of one sequence (series_analysis.cpp's
    edge_fragments_mpl with frag_size windows)."""
    frags = [seq[i:i + frag_size]
             for i in range(0, max(len(seq) - frag_size + 1, 1), frag_size)]
    frags = [f for f in frags if len(f) > k]
    if not frags:
        return np.zeros((0, mult.shape[1]), np.float32)
    return contig_abundance(frags, kmers, mult, k)
