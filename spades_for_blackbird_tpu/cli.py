"""Command-line driver: the ``spades.py`` surface of the TPU assembler.

Mirrors the reference's top-level orchestration
(assembler/spades.py:593 main, options at
spades_pipeline/options_parser.py): parse libraries, pick the K ladder,
run the multi-K pipeline, write contigs + assembly graph into the output
directory layout the reference uses (contigs.fasta,
assembly_graph_with_scaffolds.gfa, ...).

Usage:
    python -m spades_for_blackbird_tpu -1 left.fq.gz -2 right.fq.gz -o out
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="spades_for_blackbird_tpu",
        description="TPU-native genome assembler (SPAdes-compatible surface)")
    p.add_argument("-1", dest="pe1", action="append", default=[],
                   help="file with forward paired-end reads")
    p.add_argument("-2", dest="pe2", action="append", default=[],
                   help="file with reverse paired-end reads")
    p.add_argument("-s", dest="single", action="append", default=[],
                   help="file with unpaired reads")
    p.add_argument("--12", dest="interlaced", action="append", default=[],
                   help="file with interlaced paired-end reads")
    p.add_argument("-o", dest="output_dir", required=True,
                   help="output directory")
    p.add_argument("-k", dest="k_list", default=None,
                   help="comma-separated odd k values (default: auto)")
    p.add_argument("--only-assembler", action="store_true",
                   help="skip read error correction (currently always on)")
    p.add_argument("--careful", action="store_true",
                   help="mismatch correction post-pass (not yet wired)")
    p.add_argument("--test", action="store_true",
                   help="run on the bundled toy dataset")
    p.add_argument("--min-contig-length", type=int, default=None)
    p.add_argument("--threads", "-t", type=int, default=None,
                   help="accepted for CLI compatibility (device-parallel)")
    p.add_argument("--memory", "-m", type=int, default=None,
                   help="accepted for CLI compatibility")
    return p


TEST_DATASET = "/root/reference/assembler/test_dataset"


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from .io import fastq, fasta, gfa
    from .pipeline import assemble

    if args.test:
        args.pe1 = [f"{TEST_DATASET}/ecoli_1K_1.fq.gz"]
        args.pe2 = [f"{TEST_DATASET}/ecoli_1K_2.fq.gz"]

    if len(args.pe1) != len(args.pe2):
        print("error: -1/-2 file counts differ", file=sys.stderr)
        return 2
    if not (args.pe1 or args.single or args.interlaced):
        print("error: no input reads (use -1/-2, -s, --12 or --test)",
              file=sys.stderr)
        return 2

    os.makedirs(args.output_dir, exist_ok=True)
    log_path = os.path.join(args.output_dir, "spades.log")
    log_f = open(log_path, "w")

    def log(msg):
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        print(line)
        log_f.write(line + "\n")
        log_f.flush()

    batches = []
    paired_lr: list = []
    for p1, p2 in zip(args.pe1, args.pe2):
        b1, b2 = fastq.load_paired_reads(p1, p2)
        batches += [b1, b2]
        paired_lr.append((b1, b2))
        log(f"loaded paired library {p1} + {p2}: {b1.num_reads} pairs")
    for ip in args.interlaced:
        b = fastq.load_reads(ip)
        batches.append(b)
        log(f"loaded interlaced library {ip}: {b.num_reads} reads")
    for sp in args.single:
        b = fastq.load_reads(sp)
        batches.append(b)
        log(f"loaded single library {sp}: {b.num_reads} reads")
    batch = fastq.concat_batches(batches)
    read_length = int(batch.lengths.max())
    log(f"total reads: {batch.num_reads}, max length {read_length}")

    if not args.only_assembler:
        from .hammer import correct as hammer_correct
        log("read error correction (BayesHammer equivalent, K=21)")
        corrected, hstats = hammer_correct.correct_reads(
            batch.codes, batch.lengths, k=21)
        log(f"correction: {hstats}")
        batch.codes = corrected
        # propagate to per-library views for repeat resolution
        off = 0
        for b1, b2 in paired_lr:
            b1.codes = corrected[off:off + b1.num_reads]
            off += b1.num_reads
            b2.codes = corrected[off:off + b2.num_reads]
            off += b2.num_reads

    if args.k_list:
        try:
            ks = [int(x) for x in args.k_list.split(",")]
        except ValueError:
            print(f"error: bad -k value {args.k_list!r} "
                  f"(expected comma-separated integers)", file=sys.stderr)
            return 2
        bad = [k for k in ks if k % 2 == 0 or k < 11 or k >= read_length]
        if bad:
            print(f"error: k values must be odd, >= 11 and < read length "
                  f"({read_length}); got {bad}", file=sys.stderr)
            return 2
    else:
        ks = [k for k in assemble.default_k_ladder(read_length)
              if k < read_length]
    log(f"K values: {ks}")

    t0 = time.time()
    res = assemble.assemble_multi_k(
        batch.codes, batch.lengths, ks,
        min_contig_length=args.min_contig_length)
    log(f"assembly finished in {time.time() - t0:.1f}s; "
        f"{len(res.contigs)} contigs, stats={res.stats}")

    # pre-RR edge sequences (reference writes before_rr.fasta)
    fasta.write_contigs_fasta(
        os.path.join(args.output_dir, "before_rr.fasta"), res.contigs)

    final_contigs = res.contigs
    if paired_lr:
        l1 = fastq.concat_batches([b1 for b1, _ in paired_lr])
        l2 = fastq.concat_batches([b2 for _, b2 in paired_lr])
        log("repeat resolution (exSPAnder) with paired-end support")
        final_contigs = assemble.repeat_resolution(
            res.graph, l1.codes, l1.lengths, l2.codes, l2.lengths)
        log(f"resolved {len(final_contigs)} paths")

    contigs_path = os.path.join(args.output_dir, "contigs.fasta")
    fasta.write_contigs_fasta(contigs_path, final_contigs)
    log(f"wrote {contigs_path}")
    # scaffolds == contigs until the scaffolding stage lands
    fasta.write_contigs_fasta(
        os.path.join(args.output_dir, "scaffolds.fasta"), final_contigs)

    gfa_path = os.path.join(args.output_dir,
                            "assembly_graph_with_scaffolds.gfa")
    gfa.write_gfa(gfa_path, res.graph)
    log(f"wrote {gfa_path}")

    with open(os.path.join(args.output_dir, "params.json"), "w") as f:
        json.dump({"ks": ks, "reads": int(batch.num_reads),
                   "read_length": read_length}, f)
    log("done")
    log_f.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
