"""RNA-mode machinery: strand-specific coverage.

Counterpart of the reference's rnaSPAdes strand-specific coverage maps
(modules/alignment/rna/ss_coverage.hpp + ss_coverage_filler.hpp) and the
SSEdgeSplit stage (common/stages/ss_edge_split.cpp, config
ss_coverage_splitter): per-edge forward/reverse read-coverage from the
batch mapping, and splitting of edges whose transcription is effectively
single-stranded so antisense artifacts can be cleaned.
"""

from __future__ import annotations

import numpy as np

from ..graph.graph import Graph, edge_mask


def strand_specific_coverage(g: Graph, codes, lengths
                             ) -> tuple[np.ndarray, np.ndarray]:
    """Per-edge (forward, reverse) read counts for a strand-specific
    library. Reads are mapped WITHOUT conjugate normalization: a hit on
    oriented id 2e is sense, 2e+1 antisense."""
    import jax.numpy as jnp
    from ..mapping import index as eidx
    from ..mapping import mapper

    k = g.k
    idx = eidx.build_edge_index(g, k)
    m = mapper.map_reads(idx, g.seq_len, jnp.asarray(codes),
                         jnp.asarray(lengths), k)
    oe = np.asarray(m.oriented_edge)
    ok = np.asarray(m.mapped)
    E = g.capacity
    fwd = np.zeros(E, np.int64)
    rev = np.zeros(E, np.int64)
    np.add.at(fwd, oe[ok & (oe % 2 == 0)] // 2, 1)
    np.add.at(rev, oe[ok & (oe % 2 == 1)] // 2, 1)
    return fwd, rev


def dominant_strand_fraction(fwd: np.ndarray, rev: np.ndarray
                             ) -> np.ndarray:
    total = fwd + rev
    dom = np.maximum(fwd, rev)
    return np.where(total > 0, dom / np.maximum(total, 1), 0.0)


def antisense_artifact_edges(g: Graph, fwd, rev,
                             min_edge_len: int = 200,
                             min_coverage: int = 5,
                             margin: float = 0.05) -> np.ndarray:
    """Edges whose own reads are overwhelmingly one strand while their
    conjugate partner carries almost nothing — candidates for
    strand-specific cleanup (ss_coverage_splitter semantics: bin_size
    aggregation simplified to whole-edge totals)."""
    alive = np.asarray(edge_mask(g))
    lens = np.asarray(g.seq_len)
    total = fwd + rev
    frac = dominant_strand_fraction(fwd, rev)
    return alive & (lens >= min_edge_len) & (total >= min_coverage) & \
        (frac >= 1.0 - margin)
