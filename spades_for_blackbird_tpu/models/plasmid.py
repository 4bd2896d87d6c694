"""Plasmid extraction: chromosome removal + circularity detection.

TPU-native counterpart of plasmidSPAdes' ChromosomeRemoval stage
(projects/spades/chromosome_removal.cpp, iterated with rising coverage
limits for metaplasmid at pipeline.cpp:85-97) and the circular-aware
contig output (contig_output_stage.cpp:213-240): long uniform-coverage
edges are chromosomal and get dropped; surviving circular components
(edges whose ends meet) are emitted as circular plasmid candidates with
the k-overlap trimmed.
"""

from __future__ import annotations

import numpy as np

from ..graph.graph import Graph, edge_mask
from ..ops import dna


def remove_chromosomal(g: Graph, long_edge_threshold: int = 1000,
                       coverage_window: float = 0.3) -> Graph:
    """Drop long edges whose coverage sits near the genomic median
    (chromosome_removal.cpp's long-uniform-edge heuristic)."""
    import jax.numpy as jnp
    alive = np.asarray(edge_mask(g))
    lens = np.asarray(g.seq_len)
    covs = np.asarray(g.cov)
    long_mask = alive & (lens >= long_edge_threshold)
    if not long_mask.any():
        return g
    # median coverage of long edges = chromosomal depth
    med = float(np.median(covs[long_mask]))
    lo, hi = med * (1 - coverage_window), med * (1 + coverage_window)
    kill = long_mask & (covs >= lo) & (covs <= hi)
    conj = np.asarray(g.conj)
    kill = kill | kill[conj]
    return g._replace(alive=g.alive & ~np.asarray(kill))


def circular_contigs(g: Graph, min_length: int = 300
                     ) -> list[tuple[str, float, bool]]:
    """Contigs with circularity flags: (sequence, coverage, is_circular).

    An edge whose start and end vertices coincide is a circular component
    (our condensation breaks perfect cycles into one such edge); circular
    sequences are emitted with the k-base wrap overlap trimmed, mirroring
    the reference's cutting of circular paths.
    """
    alive = np.asarray(edge_mask(g))
    conj = np.asarray(g.conj)
    starts = np.asarray(g.seq_start)
    lens = np.asarray(g.seq_len)
    covs = np.asarray(g.cov)
    flat = np.asarray(g.seq_flat)
    start_v = np.asarray(g.start_v)
    end_v = np.asarray(g.end_v)
    k = g.k
    out = []
    for e in np.nonzero(alive)[0]:
        if conj[e] < e and alive[conj[e]]:
            continue
        if lens[e] < min_length:
            continue
        seq = dna.decode_codes(flat[starts[e]:starts[e] + lens[e]])
        circular = bool(start_v[e] == end_v[e]) and lens[e] > k
        if circular:
            seq = seq[:-k]  # trim wrap overlap
        out.append((seq, float(covs[e]), circular))
    out.sort(key=lambda t: (-len(t[0]), t[0]))
    return out


def write_plasmid_fasta(path: str, contigs: list[tuple[str, float, bool]],
                        line_width: int = 60) -> None:
    """plasmidSPAdes naming: circular contigs carry a component suffix
    (contig_output_stage.cpp cuts and names circulars)."""
    with open(path, "w") as f:
        for i, (seq, cov, circ) in enumerate(contigs, start=1):
            suffix = "_circular" if circ else ""
            f.write(f">NODE_{i}_length_{len(seq)}_cov_{cov:.6f}{suffix}\n")
            for j in range(0, len(seq), line_width):
                f.write(seq[j:j + line_width] + "\n")
