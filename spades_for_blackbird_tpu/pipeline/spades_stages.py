"""Concrete stage list for the main assembly pipeline.

Mirrors ``assemble_genome``'s stage assembly
(projects/spades/pipeline.cpp:213-290): ReadConversion ->
[ErrorCorrection] -> one iteration stage per K (Construction +
GenomicInfoFiller + Simplification fused, common/stages/*) ->
RepeatResolution -> ContigOutput.
"""

from __future__ import annotations

import os

import numpy as np

from .stages import PipelineContext, Stage


def make_read_conversion(pe_pairs, interlaced, singles, log):
    def run(ctx: PipelineContext):
        from ..io import fastq
        batches = []
        paired_ranges = []
        row = 0
        for p1, p2 in pe_pairs:
            b1, b2 = fastq.load_paired_reads(p1, p2)
            batches += [b1, b2]
            paired_ranges.append((row, b1.num_reads,
                                  row + b1.num_reads, b2.num_reads))
            row += b1.num_reads + b2.num_reads
            log(f"loaded paired library {p1} + {p2}: {b1.num_reads} pairs")
        for ip in interlaced:
            b = fastq.load_reads(ip)
            # even rows = first mates, odd = second; split into halves
            half = b.num_reads // 2
            ev = fastq.ReadBatch(b.codes[0::2], b.lengths[0::2])
            od = fastq.ReadBatch(b.codes[1::2], b.lengths[1::2])
            batches += [ev, od]
            paired_ranges.append((row, ev.num_reads,
                                  row + ev.num_reads, od.num_reads))
            row += ev.num_reads + od.num_reads
            log(f"loaded interlaced library {ip}: {half} pairs")
        for sp in singles:
            b = fastq.load_reads(sp)
            batches.append(b)
            row += b.num_reads
            log(f"loaded single library {sp}: {b.num_reads} reads")
        batch = fastq.concat_batches(batches)
        ctx.codes = batch.codes
        ctx.lengths = batch.lengths
        ctx.paired_ranges = paired_ranges
        ctx.read_length = int(batch.lengths.max()) if batch.num_reads else 0
        log(f"total reads: {batch.num_reads}, max length {ctx.read_length}")
    return Stage("read_conversion", run)


def make_error_correction(log, k: int = 21):
    def run(ctx: PipelineContext):
        from ..hammer import correct as hammer_correct
        corrected, hstats = hammer_correct.correct_reads(
            ctx.codes, ctx.lengths, k=k)
        log(f"correction: {hstats}")
        ctx.codes = corrected
        ctx.params["hammer"] = hstats
    return Stage("error_correction", run)


def make_iteration(k: int, log, min_contig_length=None):
    def run(ctx: PipelineContext):
        from . import assemble
        res = assemble.assemble_single_k(
            ctx.codes, ctx.lengths, k,
            min_contig_length=min_contig_length,
            extra_sequences=[s for s, _ in ctx.contigs])
        ctx.contigs = res.contigs
        ctx.graph = res.graph
        ctx.genomic_info = res.genomic_info
        ctx.params.setdefault("ks_done", []).append(k)
        log(f"K={k}: {res.stats}")
    return Stage(f"k{k}", run)


def make_repeat_resolution(log):
    def run(ctx: PipelineContext):
        from . import assemble
        if not ctx.paired_ranges or ctx.graph is None:
            ctx.final_contigs = list(ctx.contigs)
            log("no paired libraries: RR skipped (contig paths only, "
                "repeat_resolving.cpp:62 'rr disabled' branch)")
            return
        import jax.numpy as jnp
        c, l = ctx.codes, ctx.lengths
        idx1 = np.concatenate([np.arange(s1, s1 + n1)
                               for s1, n1, _, _ in ctx.paired_ranges])
        idx2 = np.concatenate([np.arange(s2, s2 + n2)
                               for _, _, s2, n2 in ctx.paired_ranges])
        final = assemble.repeat_resolution(
            ctx.graph, jnp.asarray(np.asarray(c)[idx1]),
            jnp.asarray(np.asarray(l)[idx1]),
            jnp.asarray(np.asarray(c)[idx2]),
            jnp.asarray(np.asarray(l)[idx2]))
        ctx.final_contigs = final
        log(f"resolved {len(final)} paths")
    return Stage("repeat_resolution", run)


def make_contig_output(output_dir: str, log):
    def run(ctx: PipelineContext):
        from ..io import fasta, gfa
        fasta.write_contigs_fasta(
            os.path.join(output_dir, "before_rr.fasta"), ctx.contigs)
        final = ctx.final_contigs or ctx.contigs
        fasta.write_contigs_fasta(
            os.path.join(output_dir, "contigs.fasta"), final)
        fasta.write_contigs_fasta(
            os.path.join(output_dir, "scaffolds.fasta"), final)
        if ctx.graph is not None:
            gfa.write_gfa(os.path.join(
                output_dir, "assembly_graph_with_scaffolds.gfa"), ctx.graph)
        log(f"wrote {len(final)} contigs to {output_dir}")
    return Stage("contig_output", run)


def build_stage_list(args, ks, log):
    """pipeline.cpp:250-285 equivalent."""
    pe_pairs = list(zip(args.pe1, args.pe2))
    stages = [make_read_conversion(pe_pairs, args.interlaced, args.single,
                                   log)]
    if not args.only_assembler:
        stages.append(make_error_correction(log))
    for k in ks:
        stages.append(make_iteration(k, log,
                                     min_contig_length=args.min_contig_length))
    stages.append(make_repeat_resolution(log))
    stages.append(make_contig_output(args.output_dir, log))
    return stages
