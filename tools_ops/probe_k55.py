"""Isolate the k55 W=4 worker crash: run each construction phase at
4.6 Mb k=55 shapes from genome-derived (k+1)-mer tables, with per-phase
timing and device memory stats.

The real run's crash point moved (after the Pallas W<=3 cap) into the
"later construction syncs" — vertex table / early tips / condense at
the k55 rung (NOTES_ROUND5.md). This probe rebuilds the same shapes
without running EC: window-chop the truth genome, count 56-mers
chunked, then drive every post-count phase one sync at a time.

Usage: python tools_ops/probe_k55.py [--phase all|count|vt|tips|condense]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.environ.get("SFB_REPO", "/root/repo"))


def log(msg):
    print(f"[probe {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def memstats(dev):
    try:
        s = dev.memory_stats()
        if not s:
            return "no-memstats"
        used = s.get("bytes_in_use", 0) / 1e9
        peak = s.get("peak_bytes_in_use", 0) / 1e9
        lim = s.get("bytes_limit", 0) / 1e9
        return f"in_use={used:.2f}G peak={peak:.2f}G limit={lim:.2f}G"
    except Exception as e:
        return f"memstats-err {e}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all")
    ap.add_argument("--genome", default="/tmp/scale46_r4/truth.fasta")
    ap.add_argument("--k", type=int, default=55)
    args = ap.parse_args()

    from spades_for_blackbird_tpu.utils.jaxcache import (
        enable_compilation_cache)
    import jax
    import jax.numpy as jnp
    import numpy as np
    dev = jax.devices()[0]
    log(f"device {dev} cache={enable_compilation_cache()}")

    from spades_for_blackbird_tpu.kmers import counter, extension
    from spades_for_blackbird_tpu.pipeline.assemble import (
        _windows_from_sequences)

    seqs, cur = [], []
    with open(args.genome) as f:
        for line in f:
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                cur = []
            else:
                cur.append(line.strip())
    if cur:
        seqs.append("".join(cur))
    k = args.k
    log(f"genome {sum(map(len, seqs))} bp; chopping windows")
    codes, lengths = _windows_from_sequences(seqs, 100, k + 1)
    log(f"windows {codes.shape}")

    t0 = time.time()
    kp1 = counter.trim_table(counter.count_kmers_chunked(
        jnp.asarray(codes), jnp.asarray(lengths), k + 1))
    jax.block_until_ready(kp1.kmers)
    log(f"count done {time.time()-t0:.1f}s cap={kp1.capacity} "
        f"num={int(kp1.num)} W={kp1.kmers.shape[1]}  {memstats(dev)}")
    if args.phase == "count":
        return

    t0 = time.time()
    vt = extension.build_vertex_table(kp1, k)
    jax.block_until_ready(vt.kmers)
    log(f"vertex_table done {time.time()-t0:.1f}s cap={vt.capacity} "
        f"num={int(vt.num)}  {memstats(dev)}")
    if args.phase == "vt":
        return

    from spades_for_blackbird_tpu.kmers import early_tips
    t0 = time.time()
    kp1b, n_tips = early_tips.clip_early_tips(kp1, vt, k, 100 - k)
    jax.block_until_ready(kp1b.kmers)
    log(f"early_tips done {time.time()-t0:.1f}s removed={n_tips}  "
        f"{memstats(dev)}")
    if n_tips:
        kp1b = counter.trim_table(kp1b)
        vt = extension.build_vertex_table(kp1b, k)
        jax.block_until_ready(vt.kmers)
        log(f"vt rebuild done cap={vt.capacity}  {memstats(dev)}")
    if args.phase == "tips":
        return

    from spades_for_blackbird_tpu.graph import condense
    from spades_for_blackbird_tpu.graph.graph import compact_graph
    t0 = time.time()
    g = condense.build_graph(kp1b, vt, k)
    jax.block_until_ready(g.seq_flat)
    log(f"condense done {time.time()-t0:.1f}s edges={int(g.num_edges)} "
        f"flat={g.seq_flat.shape[0]}  {memstats(dev)}")
    t0 = time.time()
    g2, v_space = compact_graph(g)
    jax.block_until_ready(g2.seq_flat)
    log(f"compact done {time.time()-t0:.1f}s cap={g2.capacity} "
        f"flat={g2.seq_flat.shape[0]}  {memstats(dev)}")
    log("ALL PHASES PASSED")


if __name__ == "__main__":
    main()
