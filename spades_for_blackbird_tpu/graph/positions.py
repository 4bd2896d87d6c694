"""Edge position tracking: where graph edges sit in named sequences.

Counterpart of the reference's ``EdgePositionHandler``
(assembly_graph/handlers/edges_position_handler.hpp:22): in developer
mode every edge records the (reference, range, strand) intervals it
aligns to, feeding detail printers and debugging. Here positions are
recovered in one vectorized pass: every (k+1)-mer of the named sequence
looks itself up in the edge k-mer index, and colinear runs of
(edge, offset) hits compress into ranges.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..mapping import index as eidx
from ..ops import dna, kmer, segments
from .graph import Graph


@dataclass
class EdgeRange:
    name: str       # sequence name
    seq_start: int  # range in the named sequence (bases)
    seq_end: int
    edge_start: int  # matching range start within the edge
    is_fwd: bool    # sequence runs along the edge's stored orientation


def fill_edge_positions(g: Graph, sequences: dict[str, str],
                        chunk: int = 1 << 18
                        ) -> dict[int, list[EdgeRange]]:
    """Map every named sequence onto the graph; returns per-edge ranges.

    Chunked over sequence positions so arbitrarily long references
    stream through fixed-shape lookups.
    """
    k = g.k
    idx = eidx.build_edge_index(g, k + 1)
    positions: dict[int, list[EdgeRange]] = {}

    for name, seq in sequences.items():
        L = len(seq)
        if L < k + 1:
            continue
        # pow2-bucketed chunk: short references must not pay a
        # full-chunk-sized compile
        chunk_n = min(chunk, 1 << max(1, (L - 1).bit_length()))
        codes = np.asarray(dna.encode_reads([seq])[0][0])[:L]
        n_kmers = L - k
        edges = np.zeros(n_kmers, np.int64)
        offs = np.zeros(n_kmers, np.int64)
        fwd = np.zeros(n_kmers, bool)
        found_all = np.zeros(n_kmers, bool)
        step = chunk_n - k  # overlap so every k-mer is covered once
        for lo in range(0, n_kmers, step):
            hi = min(lo + step, n_kmers)
            piece = codes[lo:min(hi + k, L)]
            pl = len(piece)
            pad = chunk_n + k - pl
            c = jnp.asarray(np.pad(piece, (0, pad), constant_values=4)
                            )[None, :]
            ln = jnp.asarray([pl], np.int32)
            kmers, valid = kmer.extract_kmers(c, ln, k + 1)
            canon, is_fwd = dna.canonicalize_kmers(kmers, k + 1)
            W = canon.shape[2]
            row = np.asarray(segments.searchsorted_rows(
                idx.kmers, canon.reshape(-1, W)))[:hi - lo]
            v = np.asarray(valid)[0][:hi - lo]
            ok = (row < int(idx.num)) & v
            safe = np.minimum(row, idx.kmers.shape[0] - 1)
            edges[lo:hi] = np.asarray(idx.edge)[safe]
            offs[lo:hi] = np.asarray(idx.offset)[safe]
            f = np.asarray(is_fwd)[0][:hi - lo] == np.asarray(
                idx.is_fwd)[safe]
            fwd[lo:hi] = f
            found_all[lo:hi] = ok

        # colinear run-length encode: same edge, same strand, stored
        # offset advancing +1 along the edge (fwd) / -1 (rc)
        same = (edges[1:] == edges[:-1]) & (fwd[1:] == fwd[:-1]) & \
            found_all[1:] & found_all[:-1] & \
            (offs[1:] - offs[:-1] == np.where(fwd[1:], 1, -1))
        breaks = np.nonzero(~same)[0]
        starts = np.concatenate([[0], breaks + 1])
        ends = np.concatenate([breaks, [n_kmers - 1]])
        for s, e in zip(starts, ends):
            if not found_all[s]:
                continue
            edge = int(edges[s])
            r = EdgeRange(
                name=name, seq_start=int(s), seq_end=int(e) + k + 1,
                edge_start=int(min(offs[s], offs[e])),
                is_fwd=bool(fwd[s]))
            positions.setdefault(edge, []).append(r)
    return positions


def positions_table(g: Graph, sequences: dict[str, str]) -> list[str]:
    """TSV lines 'edge  name  seq_start-seq_end  edge_start  strand'
    (the detail printer's position dump)."""
    pos = fill_edge_positions(g, sequences)
    out = []
    for e in sorted(pos):
        for r in pos[e]:
            out.append(f"{e}\t{r.name}\t{r.seq_start}-{r.seq_end}\t"
                       f"{r.edge_start}\t{'+' if r.is_fwd else '-'}")
    return out
