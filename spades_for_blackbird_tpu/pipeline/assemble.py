"""Single-K assembly pipeline: reads -> simplified graph -> contigs.

The in-process analogue of the reference's per-K ``spades-core`` stage list
(assembler/src/projects/spades/pipeline.cpp:213-290): Construction ->
GenomicInfoFiller -> Simplification -> ContigOutput. Multi-K iteration,
gap closing, paired-info/repeat-resolution stages layer on top (SURVEY.md
§7 steps 5-7).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..graph import construct
from ..io import fasta
from ..kmers import counter, coverage_model
from ..simplify import runner
from ..ops import kmer as kmer_ops
from ..ops import dna


@dataclass
class AssemblyResult:
    contigs: list[tuple[str, float]]
    genomic_info: coverage_model.GenomicInfo
    stats: dict


def assemble_single_k(codes, lengths, k: int,
                      cfg: runner.SimplifyConfig | None = None,
                      min_contig_length: int | None = None,
                      min_kmer_count: int = 1) -> AssemblyResult:
    """Assemble one read batch at a single K.

    Args:
      codes/lengths: packed read batch (R, L) uint8 / (R,) int32.
      k: odd k-mer size (vertex size; edges from (k+1)-mers).
      cfg: simplification parameters (defaults mirror the reference).
      min_contig_length: drop contigs shorter than this (default 2k).
    """
    if k % 2 == 0:
        raise ValueError(f"k must be odd (reference enforces this, "
                         f"projects/spades/main.cpp:101), got {k}")
    read_length = int(codes.shape[1])
    if cfg is None:
        cfg = runner.SimplifyConfig(read_length=read_length)

    # Construction (+ coverage model on the (k+1)-mer spectrum)
    kp1 = counter.count_kmers(codes, lengths, k + 1)
    ginfo = coverage_model.fit_coverage_model(
        np.asarray(kp1.counts[:int(kp1.num)]))
    if min_kmer_count > 1:
        kp1 = counter.filter_min_count(kp1, min_kmer_count)
    from ..kmers import extension
    from ..graph import condense
    vt = extension.build_vertex_table(kp1, k)
    g = condense.build_graph(kp1, vt, k)
    v_space = 2 * vt.capacity

    # Simplification
    g = runner.simplify_graph(g, v_space, ginfo.ec_bound, cfg)

    if min_contig_length is None:
        min_contig_length = 2 * k
    contigs = fasta.graph_contigs(g, min_length=min_contig_length)
    return AssemblyResult(
        contigs=contigs,
        genomic_info=ginfo,
        stats=construct.graph_stats(g),
    )
