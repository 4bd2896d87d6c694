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
    graph: object = None  # final simplified Graph (for GFA/FASTG output)


def assemble_single_k(codes, lengths, k: int,
                      cfg: runner.SimplifyConfig | None = None,
                      min_contig_length: int | None = None,
                      min_kmer_count: int = 1,
                      extra_sequences: list[str] | None = None,
                      restricted_sequences: list[str] | None = None,
                      uneven_depth: bool = False) -> AssemblyResult:
    """Assemble one read batch at a single K.

    Args:
      codes/lengths: packed read batch (R, L) uint8 / (R,) int32.
      k: odd k-mer size (vertex size; edges from (k+1)-mers).
      cfg: simplification parameters (defaults mirror the reference).
      min_contig_length: drop contigs shorter than this (default 2k).
      extra_sequences: additional sequences fed into construction (the
        multi-K "--additional-contigs" mechanism,
        spades_pipeline/stages/spades_iteration_stage.py:167-180).
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
    if extra_sequences:
        extra = [s for s in extra_sequences if len(s) > k]
        if extra:
            ec, el = dna.encode_reads(extra)
            kp1 = counter.merge_tables(
                kp1, counter.count_kmers(ec, el, k + 1))
    if min_kmer_count == "auto":  # --cov-cutoff auto
        min_kmer_count = max(2, int(ginfo.ec_bound))
    if min_kmer_count > 1:
        kp1 = counter.filter_min_count(kp1, min_kmer_count)
    from ..kmers import extension
    from ..graph import condense
    from ..graph.graph import compact_graph
    vt = extension.build_vertex_table(kp1, k)
    g = condense.build_graph(kp1, vt, k)
    # trim the table-capacity-sized graph to compact power-of-two
    # shapes: simplification scatters and their compiles scale with
    # edge capacity, not with the (k+1)-mer table
    g, v_space = compact_graph(g)

    if uneven_depth:
        # meta/MDA: the spectrum mixture fit is unreliable under uneven
        # depth; use the graph-based threshold finder instead
        # (genomic_info_filler.cpp:31-45, ec_threshold_finder.hpp:25)
        from ..simplify import ec_threshold
        import dataclasses
        ginfo = dataclasses.replace(
            ginfo, ec_bound=ec_threshold.uneven_ec_bound(g))

    # Simplification; restricted sequences (blackbird fork /
    # biosyntheticSPAdes, restricted_edges_filling.cpp:16-41) protect
    # their edges from bulge gluing
    protected_fn = None
    if restricted_sequences:
        import jax.numpy as jnp
        from ..models import bio

        def protected_fn(gr):
            return jnp.asarray(
                bio.fill_restricted_edges(gr, restricted_sequences))
    g = runner.simplify_graph(g, v_space, ginfo.ec_bound, cfg,
                              protected_fn=protected_fn)

    if min_contig_length is None:
        min_contig_length = 2 * k
    contigs = fasta.graph_contigs(g, min_length=min_contig_length)
    return AssemblyResult(
        contigs=contigs,
        genomic_info=ginfo,
        stats=construct.graph_stats(g),
        graph=g,
    )


# Reference default K ladders (spades_pipeline/options_storage.py:62-77)
K_MERS_SHORT = [21, 33, 55]
K_MERS_150 = [21, 33, 55, 77]
K_MERS_250 = [21, 33, 55, 77, 99, 127]


def default_k_ladder(read_length: int) -> list[int]:
    """Auto K selection from read length (spades_stage.py:41-120)."""
    if read_length >= 250:
        return K_MERS_250
    if read_length >= 150:
        return K_MERS_150
    return K_MERS_SHORT


def repeat_resolution(g, codes1, lengths1, codes2, lengths2,
                      with_scaffolds: bool = False,
                      estimator: str = "simple"):
    """exSPAnder repeat resolution over the final graph using one
    paired library (the RepeatResolution stage,
    projects/spades/repeat_resolving.cpp:62). See
    ``repeat_resolution_multi`` for the per-library model.
    """
    kind = "mp" if estimator == "smoothing" else "pe"
    return repeat_resolution_multi(
        g, [(codes1, lengths1, codes2, lengths2, kind)],
        with_scaffolds=with_scaffolds)


def repeat_resolution_multi(g, libs, with_scaffolds: bool = False,
                            lib_data_out: list | None = None,
                            scaffold_graph_out: dict | None = None,
                            scaffolding_estimator: str | None = None):
    """Per-library repeat resolution (pair_info_count.cpp:186-230 +
    extenders_logic.cpp per-lib extender construction): each library
    gets its OWN insert-size estimate, paired-index shift and distance
    estimator (simple for PE, multi-peak smoothing for MP,
    distance_estimation.cpp estimator choice per library type), then all
    feed the composite extender.

    ``libs``: list of (codes1, lengths1, codes2, lengths2, kind) with
    kind in {"pe", "mp"}; second mates as read (FR orientation after
    read conversion) — reverse-complemented here to face downstream.
    """
    import jax.numpy as jnp
    from ..mapping import chunked
    from ..mapping import index as eidx
    from ..mapping import mapper
    from ..paired import insert_size, pair_info
    from ..path_extend import resolver

    k = g.k
    idx = eidx.build_edge_index(g, k + 1)

    def first_placement(ch):
        return mapper.ReadMapping(
            oriented_edge=ch.oriented_edge[:, 0], start=ch.start[:, 0],
            votes=ch.votes[:, 0], mapped=ch.mapped)

    total_bases = sum(
        float(np.asarray(l1).sum() + np.asarray(l2).sum())
        for _, l1, _, l2, _ in libs) or 1.0
    specs = []
    clustered_all = []
    for codes1, lengths1, codes2, lengths2, kind in libs:
        c2rc = dna.revcomp_reads(codes2, lengths2)
        # chain mappings: junction-spanning reads place on EVERY
        # traversed edge (the MappingPath equivalent) — pair filling
        # uses all edge combinations + split-read adjacency pairs.
        # Chunked: big libraries stream through fixed-shape chunks so
        # the (R, P) vote intermediates stay bounded.
        ch1 = chunked.map_reads_multi_chunked(
            idx, g.seq_len, codes1, lengths1, k + 1, min_votes=1)
        ch2 = chunked.map_reads_multi_chunked(
            idx, g.seq_len, c2rc, lengths2, k + 1, min_votes=1)
        ch1 = mapper.normalize_chain(ch1, g.conj)
        ch2 = mapper.normalize_chain(ch2, g.conj)
        m1 = first_placement(ch1)
        m2 = first_placement(ch2)
        stats = insert_size.estimate_insert_size(
            m1, m2, np.asarray(lengths2))
        if lib_data_out is not None:
            # the final.lib_data equivalent (pipeline.cpp:288
            # write_lib_data): estimated per-lib parameters
            lib_data_out.append({
                "kind": kind,
                "read_length": int(max(
                    np.asarray(lengths1).max(initial=0),
                    np.asarray(lengths2).max(initial=0))),
                "insert_size_median": float(stats.median),
                "insert_size_mad": float(stats.mad),
                "pairs_used": int(stats.count),
            })
        if stats.count == 0:
            continue
        mean_l2 = float(np.asarray(lengths2).mean())
        pi = pair_info.fill_paired_index_multi_chunked(
            ch1, ch2, jnp.int32(int(round(stats.median - mean_l2))))
        spread = max(5, int(3 * stats.mad))
        if kind == "mp":
            # mate pairs: broad, multi-modal histograms -> multi-peak
            # smoothing estimator (smoothing_distance_estimation.hpp:19)
            clustered = pair_info.cluster_distances_smoothing(
                pi, jnp.int32(max(spread, 20)), jnp.float32(2.0))
        else:
            clustered = pair_info.cluster_distances(pi, jnp.int32(spread))
            # PairInfoImprover's FillMissing on the clustered PE index
            # (distance_estimation.cpp:161 + pair_info_improver.hpp:215):
            # split-path derivation along forced path suffixes only — a
            # blind transitive join would fabricate cross-repeat links
            clustered = pair_info.split_path_fill(
                g, clustered, float(stats.median),
                float(stats.deviation))
        read_length = int(max(np.asarray(lengths1).max(initial=0),
                              np.asarray(lengths2).max(initial=0)))
        share = float(np.asarray(lengths1).sum()
                      + np.asarray(lengths2).sum()) / total_bases
        specs.append(resolver.LibSpec(
            clustered, is_stats=stats, read_length=read_length,
            kind=kind, coverage_share=share))
        if scaffolding_estimator == "weighted" and stats.histogram:
            # separate scaffolding index: graph-distance snapping with
            # the IS-distribution weight function
            # (estimate_scaffolding_distance,
            # projects/spades/distance_estimation.cpp:100-135)
            clustered_all.append(pair_info.weighted_cluster_distances(
                g, pi, stats.histogram, float(stats.median),
                float(stats.deviation)))
        else:
            clustered_all.append(clustered)

    if not specs:
        from ..io import fasta
        contigs = fasta.graph_contigs(g, min_length=2 * k)
        return (contigs, contigs) if with_scaffolds else contigs

    ps = resolver.resolve_paths_multi(g, specs)
    # tandem-repeat traversal after extension (launcher.cpp:301
    # TraverseLoops): joins surface as k+100 N gaps in scaffolds
    from ..path_extend import loop_traverser
    loop_joins = loop_traverser.traverse_loops(g, ps)
    contigs = resolver.paths_to_contigs(g, ps)
    if not with_scaffolds:
        return contigs
    from ..path_extend import polisher, scaffolder
    merged = pair_info.merge_paired_indices(clustered_all)
    chains = scaffolder.scaffold_paths(g, ps, merged,
                                       forced_joins=loop_joins,
                                       sg_out=scaffold_graph_out)
    # gap polishing: unique graph paths replace N runs
    # (scaffolder2015/path_polisher.cpp)
    chains, _ = polisher.polish_scaffolds(g, chains)
    scaffolds = scaffolder.scaffolds_to_contigs(g, chains)
    return contigs, scaffolds


def assemble_multi_k(codes, lengths, ks: list[int] | None = None,
                     cfg: runner.SimplifyConfig | None = None,
                     min_contig_length: int | None = None
                     ) -> AssemblyResult:
    """Iterative multi-K assembly (the spades.py per-K loop,
    spades.py:533-565): each K's contigs seed the next K's construction."""
    if ks is None:
        ks = [k for k in default_k_ladder(int(codes.shape[1]))
              if k < int(codes.shape[1])]
    result = None
    prev_contigs: list[str] = []
    for k in ks:
        result = assemble_single_k(
            codes, lengths, k, cfg=cfg,
            min_contig_length=min_contig_length,
            extra_sequences=prev_contigs)
        prev_contigs = [s for s, _ in result.contigs]
    return result
