"""Standalone tool CLIs mirroring the reference's auxiliary binaries
(SURVEY.md §2.10): one dispatcher with subcommands instead of separate
executables.

    python -m spades_for_blackbird_tpu.tools <tool> ...

Tools:
  gbuilder        graph builder -> GFA/FASTG/unitig FASTA
                  (projects/gbuilder/main.cpp:103-220)
  kmercount       disk k-mer counter -> TSV of (kmer, count)
                  (projects/kmercount/main.cpp:186-215)
  kmer-estimating HLL cardinality estimator
                  (projects/kmercount/kmer_estimating.cpp:61)
  read-filter     drop reads with low median k-mer coverage
                  (projects/kmercount/read_filter.cpp:80-122)
  gsimplifier     simplify a GFA graph in place
                  (projects/gsimplifier, metaMAG usage)
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _load(paths):
    from .io import fastq
    batches = [fastq.load_reads(p) for p in paths]
    return fastq.concat_batches(batches)


def cmd_gbuilder(argv):
    p = argparse.ArgumentParser(prog="gbuilder")
    p.add_argument("reads", nargs="+")
    p.add_argument("-k", type=int, default=55)
    p.add_argument("--gfa", default=None)
    p.add_argument("--fastg", default=None)
    p.add_argument("--unitigs", default=None)
    p.add_argument("--min-count", type=int, default=1)
    a = p.parse_args(argv)
    from .graph import construct
    from .io import fasta, fastg, gfa
    b = _load(a.reads)
    g = construct.graph_from_reads(b.codes, b.lengths, a.k,
                                   min_count=a.min_count)
    stats = construct.graph_stats(g)
    print(f"graph: {stats}")
    if a.gfa:
        gfa.write_gfa(a.gfa, g)
    if a.fastg:
        fastg.write_fastg(a.fastg, g)
    if a.unitigs:
        fasta.write_contigs_fasta(a.unitigs, fasta.graph_contigs(g))
    return 0


def cmd_kmercount(argv):
    p = argparse.ArgumentParser(prog="kmercount")
    p.add_argument("reads", nargs="+")
    p.add_argument("-k", type=int, default=21)
    p.add_argument("-o", "--output", default="-")
    p.add_argument("--min-count", type=int, default=1)
    a = p.parse_args(argv)
    from .kmers import counter
    from .ops import dna
    b = _load(a.reads)
    t = counter.count_kmers(b.codes, b.lengths, a.k)
    if a.min_count > 1:
        t = counter.filter_min_count(t, a.min_count)
    n = int(t.num)
    out = sys.stdout if a.output == "-" else open(a.output, "w")
    kms = np.asarray(dna.unpack_kmers(t.kmers[:n], a.k))
    cnts = np.asarray(t.counts[:n])
    for i in range(n):
        out.write(f"{dna.decode_codes(kms[i])}\t{int(cnts[i])}\n")
    if out is not sys.stdout:
        out.close()
    print(f"{n} distinct canonical {a.k}-mers", file=sys.stderr)
    return 0


def cmd_kmer_estimating(argv):
    p = argparse.ArgumentParser(prog="kmer-estimating")
    p.add_argument("reads", nargs="+")
    p.add_argument("-k", type=int, default=21)
    a = p.parse_args(argv)
    from .kmers import hll
    b = _load(a.reads)
    est = hll.estimate_kmer_cardinality(b.codes, b.lengths, a.k)
    print(f"{est:.0f}")
    return 0


def cmd_read_filter(argv):
    p = argparse.ArgumentParser(prog="read-filter")
    p.add_argument("reads", nargs="+")
    p.add_argument("-k", type=int, default=21)
    p.add_argument("--min-coverage", type=int, default=2,
                   help="drop reads whose median k-mer count is below this")
    p.add_argument("-o", "--output", required=True)
    a = p.parse_args(argv)
    import jax.numpy as jnp
    from .kmers import counter
    from .ops import dna, kmer as kmer_ops
    from .ops import segments
    b = _load(a.reads)
    t = counter.count_kmers(b.codes, b.lengths, a.k)
    canon, valid, _ = kmer_ops.extract_canonical_kmers(
        jnp.asarray(b.codes), jnp.asarray(b.lengths), a.k)
    R, P, W = canon.shape
    row = segments.searchsorted_rows(t.kmers, canon.reshape(-1, W))
    found = (row < t.num).reshape(R, P) & valid
    cnt = jnp.where(found, t.counts[jnp.minimum(row, t.capacity - 1)
                                    ].reshape(R, P), 0)
    # median over valid positions ~ sort each row and index the middle
    cnt_sorted = jnp.sort(jnp.where(valid, cnt, jnp.int32(1 << 30)), axis=1)
    nvalid = jnp.sum(valid, axis=1)
    med = cnt_sorted[jnp.arange(R), jnp.maximum(nvalid // 2, 0)]
    keep = np.asarray((med >= a.min_coverage) & (nvalid > 0))
    from .io import fasta as fasta_io
    with open(a.output, "w") as f:
        kept = 0
        codes = np.asarray(b.codes)
        lengths = np.asarray(b.lengths)
        for i in np.nonzero(keep)[0]:
            seq = dna.decode_codes(codes[i][:lengths[i]])
            f.write(f">read_{i}\n{seq}\n")
            kept += 1
    print(f"kept {kept}/{R} reads", file=sys.stderr)
    return 0


def cmd_gsimplifier(argv):
    p = argparse.ArgumentParser(prog="gsimplifier")
    p.add_argument("input_gfa")
    p.add_argument("output_gfa")
    p.add_argument("--read-length", type=int, default=100)
    p.add_argument("--ec-bound", type=float, default=2.0)
    a = p.parse_args(argv)
    from .io import gfa
    from .graph import construct
    from .graph.from_gfa import graph_from_gfa
    from .simplify import runner
    g = graph_from_gfa(a.input_gfa)
    v_space = int(np.asarray(g.start_v).max()
                  if g.capacity else 0) + 2
    v_space = max(v_space, int(np.asarray(g.end_v).max()) + 2)
    cfg = runner.SimplifyConfig(read_length=a.read_length)
    g = runner.simplify_graph(g, v_space, a.ec_bound, cfg)
    gfa.write_gfa(a.output_gfa, g)
    print(f"simplified: {construct.graph_stats(g)}", file=sys.stderr)
    return 0


def cmd_gmapper(argv):
    """Long-read-to-graph aligner (projects/gmapper + spaligner's batch
    alignment, align_longreads.cpp): reads + GFA -> edge-path TSV."""
    p = argparse.ArgumentParser(prog="gmapper")
    p.add_argument("graph_gfa")
    p.add_argument("reads", nargs="+")
    p.add_argument("-o", "--output", default="-")
    p.add_argument("--seed-k", type=int, default=13)
    a = p.parse_args(argv)
    from .graph.from_gfa import graph_from_gfa
    from .mapping import long_read
    g = graph_from_gfa(a.graph_gfa)
    b = _load(a.reads)
    als = long_read.align_long_reads(g, b.codes, b.lengths,
                                     seed_k=a.seed_k)
    out = sys.stdout if a.output == "-" else open(a.output, "w")
    out.write("#read\tedge_path\tread_ranges\tedge_ranges\tvotes\n")
    for al in als:
        if not al.chain:
            continue
        out.write("{}\t{}\t{}\t{}\t{}\n".format(
            al.read_id,
            ",".join(str(h.edge) for h in al.chain),
            ",".join(f"{h.read_lo}-{h.read_hi}" for h in al.chain),
            ",".join(f"{h.edge_lo}-{h.edge_hi}" for h in al.chain),
            ",".join(str(h.votes) for h in al.chain)))
    if out is not sys.stdout:
        out.close()
    print(f"aligned {sum(1 for al in als if al.chain)}/{len(als)} reads",
          file=sys.stderr)
    return 0


def _read_fasta(path):
    names, seqs, cur = [], [], []
    for line in open(path):
        if line.startswith(">"):
            if cur:
                seqs.append("".join(cur))
            names.append(line[1:].split()[0])
            cur = []
        else:
            cur.append(line.strip())
    if cur:
        seqs.append("".join(cur))
    return names, seqs


def cmd_kmer_multiplicity_counter(argv):
    """Multi-sample k-mer multiplicity profiles
    (projects/mts/kmer_multiplicity_counter.cpp)."""
    p = argparse.ArgumentParser(prog="kmer-multiplicity-counter")
    p.add_argument("samples", nargs="+",
                   help="one reads file per sample")
    p.add_argument("-k", type=int, default=21)
    p.add_argument("-o", "--output", required=True,
                   help="output .npz profile table")
    p.add_argument("--min-mult", type=int, default=2)
    a = p.parse_args(argv)
    from .mts import abundance
    batches = []
    for s in a.samples:
        b = _load([s])
        batches.append((b.codes, b.lengths))
    kmers, mult = abundance.multiplicity_profiles(batches, a.k,
                                                  min_mult=a.min_mult)
    abundance.save_profiles(a.output, kmers, mult, a.k)
    print(f"{len(kmers)} k-mers x {mult.shape[1]} samples -> {a.output}",
          file=sys.stderr)
    return 0


def cmd_contig_abundance(argv):
    """Per-contig abundance profiles
    (projects/mts/contig_abundance_counter.cpp)."""
    p = argparse.ArgumentParser(prog="contig-abundance")
    p.add_argument("contigs", help="FASTA")
    p.add_argument("profiles", help=".npz from kmer-multiplicity-counter")
    p.add_argument("-o", "--output", default="-")
    p.add_argument("--stat", choices=["median", "mean"], default="median")
    a = p.parse_args(argv)
    from .mts import abundance
    names, seqs = _read_fasta(a.contigs)
    kmers, mult, k = abundance.load_profiles(a.profiles)
    prof = abundance.contig_abundance(seqs, kmers, mult, k, stat=a.stat)
    out = sys.stdout if a.output == "-" else open(a.output, "w")
    for n, row in zip(names, prof):
        out.write(n + "\t" + "\t".join(f"{v:.2f}" for v in row) + "\n")
    if out is not sys.stdout:
        out.close()
    return 0


def cmd_prop_binning(argv):
    """Propagate bin annotation over a GFA graph + bin reads
    (projects/mts/prop_binning.cpp)."""
    p = argparse.ArgumentParser(prog="prop-binning")
    p.add_argument("graph_gfa")
    p.add_argument("annotation", help="'segment<TAB>bin' lines")
    p.add_argument("-o", "--output", required=True,
                   help="output propagated annotation")
    p.add_argument("--reads", nargs="*", default=[],
                   help="optionally bin these reads per label")
    p.add_argument("--reads-out-prefix", default="binned")
    a = p.parse_args(argv)
    from .graph.from_gfa import graph_from_gfa
    from .mts import binning
    g, seg_names = graph_from_gfa(a.graph_gfa, return_names=True)
    ann = binning.read_annotation(a.annotation)
    edge_bins = {e: b for e, name in seg_names.items()
                 for n2, b in ann.items() if n2 == name}
    labels = binning.propagate_bins(g, edge_bins)
    name_of = {e: n for e, n in seg_names.items()}
    binning.write_annotation(a.output, {
        name_of[e]: b for e, b in labels.items() if e in name_of})
    stats = binning.binning_stats(g, labels)
    for b, s in sorted(stats.items()):
        print(f"bin {b}: {s['edges']} edges, {s['length']} bp, "
              f"cov {s['mean_cov']:.1f}", file=sys.stderr)
    if a.reads:
        b = _load(a.reads)
        per_bin = binning.bin_reads(g, labels, b.codes, b.lengths)
        from .io import fastq
        for lbl, idxs in per_bin.items():
            path = f"{a.reads_out_prefix}.{lbl}.fastq.gz"
            fastq.write_reads_fastq(path, b.codes[idxs], b.lengths[idxs])
            print(f"bin {lbl}: {len(idxs)} reads -> {path}",
                  file=sys.stderr)
    return 0


TOOLS = {
    "gbuilder": cmd_gbuilder,
    "kmercount": cmd_kmercount,
    "kmer-estimating": cmd_kmer_estimating,
    "read-filter": cmd_read_filter,
    "gsimplifier": cmd_gsimplifier,
    "gmapper": cmd_gmapper,
    "kmer-multiplicity-counter": cmd_kmer_multiplicity_counter,
    "contig-abundance": cmd_contig_abundance,
    "prop-binning": cmd_prop_binning,
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0 if argv else 2
    tool = argv[0]
    if tool not in TOOLS:
        print(f"unknown tool {tool!r}; available: {', '.join(TOOLS)}",
              file=sys.stderr)
        return 2
    return TOOLS[tool](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
