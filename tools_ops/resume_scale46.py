import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

# rotate the count chunk shape across babysat attempts: a dropped
# remote-compile request blocks forever, and resubmitting the same
# shape sometimes hits the same fate — a different shape is a fresh
# compile request
ATT = "/tmp/resume46_attempts"
try:
    n_att = int(open(ATT).read().strip())
except Exception:
    n_att = 0
open(ATT, "w").write(str(n_att + 1))
if n_att >= 1:
    # pin 2^19: its compiles are already in the disk cache from the
    # attempt that got past counting — the dropped-request lottery only
    # applies to compiles not yet cached
    os.environ["SFB_COUNT_CHUNK_LOG2"] = "19"
    print(f"[resume] attempt {n_att + 1}: count chunk log2 = 19")

from spades_for_blackbird_tpu import cli
from spades_for_blackbird_tpu.utils import assess

out = "/tmp/scale46_r4"
run_dir = os.path.join(out, "asm")
t0 = time.time()
rc = cli.main(["-1", os.path.join(out, "reads_1.fastq.gz"),
               "-2", os.path.join(out, "reads_2.fastq.gz"),
               "-o", run_dir, "--continue", "--trace-time"])
t_resume = time.time() - t0
if rc != 0:
    print(json.dumps({"ok": False, "rc": rc}))
    sys.exit(rc)


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


truth = read_fasta(os.path.join(out, "truth.fasta"))[0]
contigs = read_fasta(os.path.join(run_dir, "contigs.fasta"))
report = assess.assess(contigs, truth)

# stage walls from the (appended) spades.log: sum last occurrence per stage
stage_s = {}
for line in open(os.path.join(run_dir, "spades.log")):
    m = re.search(r"== STAGE (\S+) done in ([0-9.]+)s", line)
    if m:
        stage_s[m.group(1)] = float(m.group(2))
total = round(sum(stage_s.values()), 1)
res = {
    "ok": True, "genome_size": 4600000, "n_read_pairs": 920000,
    "coverage": 40.0,
    "assembly_s": total,
    "resumed_after_hung_compile": True,
    "resume_leg_s": round(t_resume, 2),
    "stage_s": stage_s,
    "contigs": report.to_dict(),
}
scaf = os.path.join(run_dir, "scaffolds.fasta")
if os.path.exists(scaf):
    scaffolds = [s.replace("N", "") for s in read_fasta(scaf)]
    srep = assess.assess(scaffolds, truth)
    res["scaffolds"] = {"n50": srep.n50, "ng50": srep.ng50,
                        "misassemblies": srep.misassemblies}
try:
    import resource
    res["peak_rss_gb_resume_leg"] = round(resource.getrusage(
        resource.RUSAGE_SELF).ru_maxrss / (1 << 20), 2)
except Exception:
    pass
trace = os.path.join(run_dir, "spades_time_trace.json")
if os.path.exists(trace):
    ev = json.load(open(trace))["traceEvents"]
    ph = {}
    for e in ev:
        ph[e["name"]] = round(ph.get(e["name"], 0) + e["dur"] / 1e6, 1)
    res["phases_s_resume_leg"] = dict(
        sorted(ph.items(), key=lambda kv: -kv[1]))
blob = json.dumps(res)
print(blob)
with open("/root/repo/SCALE_r04_46m.json", "w") as f:
    f.write(blob + "\n")
