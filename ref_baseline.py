"""Run the reference SPAdes (built from /root/reference) on a simulated
dataset and grade it with the same assessor as scale_bench.py — the
same-host, same-reads baseline for the TPU assembler's SCALE numbers.

Usage:
  python ref_baseline.py --data /tmp/simdata1m --out /tmp/refrun1m \
      [--json-out REF_r04_1m.json] [--threads 2]

Expects a runnable reference layout at --spades (default /tmp/refspades:
spades.py + bin/{spades-core,spades-hammer,...} symlinked to a local
build; see NOTES_ROUND4.md for the build recipe).
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time


def read_fasta(path):
    seqs, cur = [], []
    with open(path) as f:
        for line in f:
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                cur = []
            else:
                cur.append(line.strip())
    if cur:
        seqs.append("".join(cur))
    return seqs


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="dir with reads_1.fastq.gz/reads_2.fastq.gz/"
                         "truth.fasta")
    ap.add_argument("--out", required=True)
    ap.add_argument("--spades", default="/tmp/refspades")
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--only-assembler", action="store_true")
    args = ap.parse_args(argv)

    spades_py = os.path.join(args.spades, "spades.py")
    if not os.path.exists(spades_py):
        print(json.dumps({"ok": False,
                          "error": f"no reference layout at {args.spades}"}))
        return 1
    cmd = [sys.executable, spades_py,
           "-1", os.path.join(args.data, "reads_1.fastq.gz"),
           "-2", os.path.join(args.data, "reads_2.fastq.gz"),
           "-o", args.out, "-t", str(args.threads)]
    if args.only_assembler:
        cmd.append("--only-assembler")
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True)
    wall = time.time() - t0
    peak_gb = resource.getrusage(
        resource.RUSAGE_CHILDREN).ru_maxrss / (1 << 20)
    out = {"ok": proc.returncode == 0, "assembly_s": round(wall, 2),
           "peak_rss_gb": round(peak_gb, 2), "threads": args.threads}
    if proc.returncode != 0:
        out["tail"] = proc.stdout[-2000:] + proc.stderr[-500:]
    else:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from spades_for_blackbird_tpu.utils import assess
        truth = read_fasta(os.path.join(args.data, "truth.fasta"))[0]
        contigs = read_fasta(os.path.join(args.out, "contigs.fasta"))
        out["contigs"] = assess.assess(contigs, truth).to_dict()
        scaf = os.path.join(args.out, "scaffolds.fasta")
        if os.path.exists(scaf):
            scaffolds = [s.replace("N", "") for s in read_fasta(scaf)]
            srep = assess.assess(scaffolds, truth)
            out["scaffolds"] = {"n50": srep.n50, "ng50": srep.ng50,
                                "misassemblies": srep.misassemblies}
    blob = json.dumps(out)
    print(blob)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(blob + "\n")
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
