"""End-to-end graph construction: reads -> condensed de Bruijn graph.

TPU-native equivalent of the reference Construction stage
(assembler/src/common/stages/construction.cpp:469-484: KMerCounting ->
ExtensionIndexBuilder -> GraphCondenser -> PHMCoverageFiller), fused into
jit regions over device arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..kmers import counter, extension
from . import condense
from .graph import Graph


def graph_from_reads(codes, lengths, k: int, min_count: int = 1) -> Graph:
    """Build the condensed graph from a read batch.

    Args:
      codes: (R, L) uint8 read codes.
      lengths: (R,) int32.
      k: vertex k-mer size (edges are built from (k+1)-mers, matching the
        reference where graph K = k and the extension index counts
        (k+1)-mers, kmer_extension_index_builder.hpp:45).
      min_count: drop (k+1)-mers seen fewer times (the reference's CQF
        coverage filter / hammer handle this; a hard floor of 1 keeps all).
    """
    kp1 = counter.count_kmers(codes, lengths, k + 1)
    if min_count > 1:
        kp1 = counter.filter_min_count(kp1, min_count)
    vt = extension.build_vertex_table(kp1, k)
    return condense.build_graph(kp1, vt, k)


def graph_stats(g: Graph) -> dict:
    """Host-side summary stats (edge count, total length, N50-ish)."""
    import numpy as np
    alive = np.asarray(g.alive) & (np.arange(g.capacity) < int(g.num_edges))
    lens = np.asarray(g.seq_len)[alive]
    covs = np.asarray(g.cov)[alive]
    if lens.size == 0:
        return {"edges": 0, "total_len": 0, "max_len": 0, "mean_cov": 0.0}
    slens = np.sort(lens)[::-1]
    half = slens.sum() / 2
    n50 = int(slens[np.cumsum(slens) >= half][0])
    return {
        "edges": int(alive.sum()),
        "total_len": int(lens.sum()),
        "max_len": int(lens.max()),
        "n50": n50,
        "mean_cov": float((covs * lens).sum() / lens.sum()),
    }
