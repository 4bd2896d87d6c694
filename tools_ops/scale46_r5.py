"""Round-5 4.6 Mb completion driver.

Resumes the 4.6 Mb run from its error_correction checkpoint
(/tmp/scale46_r4/asm/saves) under the in-pipeline supervisor
(pipeline/supervisor.py) — the round-4 blocker was dropped remote
compiles with an out-of-band babysitter; supervision is now a pipeline
property. On completion, grades contigs against the truth genome and
writes SCALE_r05_46m.json.

Wall-clock accounting: completed_stages from round 4 (read_conversion
10.6 s + error_correction 2341.4 s, SCALE_r04_46m_status.json) plus the
supervised resume time measured here. A fresh end-to-end run, if rerun
later this round, supersedes this file.
"""

import json
import os
import sys
import time

REPO = os.environ.get("SFB_REPO", "/root/repo")
sys.path.insert(0, REPO)

OUT = "/tmp/scale46_r4"
RUN_DIR = os.path.join(OUT, "asm")
PRIOR_S = 10.6 + 2341.4  # SCALE_r04_46m_status.json completed_stages


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


def main():
    from spades_for_blackbird_tpu.pipeline.supervisor import supervise_cli
    t0 = time.time()
    argv = ["-1", os.path.join(OUT, "reads_1.fastq.gz"),
            "-2", os.path.join(OUT, "reads_2.fastq.gz"),
            "-o", RUN_DIR, "--continue", "--trace-time"]
    rc = supervise_cli(argv, max_attempts=12, stall_s=480.0,
                       cooldown_s=150.0)
    t_resume = time.time() - t0
    if rc != 0:
        print(json.dumps({"ok": False, "rc": rc,
                          "resume_s": round(t_resume, 1)}))
        return rc

    from spades_for_blackbird_tpu.utils import assess
    genome = read_fasta(os.path.join(OUT, "truth.fasta"))[0]
    contigs = read_fasta(os.path.join(RUN_DIR, "contigs.fasta"))
    report = assess.assess(contigs, genome)
    out = {
        "ok": True,
        "genome_size": 4_600_000,
        "n_read_pairs": 920_000,
        "coverage": 40.0,
        "assembly_s": round(PRIOR_S + t_resume, 1),
        "resume_s": round(t_resume, 1),
        "prior_stages_s": PRIOR_S,
        "accounting": ("error_correction checkpoint carried from "
                       "round 4 (SCALE_r04_46m_status.json); "
                       "assembly_s = prior stages + supervised resume"),
        "contigs": report.to_dict(),
    }
    scaf_path = os.path.join(RUN_DIR, "scaffolds.fasta")
    if os.path.exists(scaf_path):
        scaffolds = [s.replace("N", "") for s in read_fasta(scaf_path)]
        srep = assess.assess(scaffolds, genome)
        out["scaffolds"] = {"n50": srep.n50, "ng50": srep.ng50,
                            "misassemblies": srep.misassemblies}
    trace_path = os.path.join(RUN_DIR, "spades_time_trace.json")
    if os.path.exists(trace_path):
        with open(trace_path) as f:
            events = json.load(f)["traceEvents"]
        phases = {}
        for ev in events:
            phases[ev["name"]] = round(
                phases.get(ev["name"], 0.0) + ev["dur"] / 1e6, 1)
        out["phases_s"] = dict(sorted(phases.items(),
                                      key=lambda kv: -kv[1]))
    blob = json.dumps(out)
    print(blob)
    with open("/root/repo/SCALE_r05_46m.json", "w") as f:
        f.write(blob + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
