"""GFA1 assembly-graph writer.

Replaces the reference's GFA writer (common/io/graph/gfa_writer.hpp:27):
one S(egment) per conjugate edge pair (the lower id of the pair is the
stored orientation = '+'), L(ink) records for every pair of edges meeting
at a vertex, with k-base overlaps.
"""

from __future__ import annotations

import numpy as np

from ..graph.graph import Graph, edge_mask
from ..ops import dna


def _segments(g: Graph):
    """alive canonical edges: list of (edge_id, conj_id)."""
    alive = np.asarray(edge_mask(g))
    conj = np.asarray(g.conj)
    segs = []
    for e in np.nonzero(alive)[0]:
        if conj[e] < e and alive[conj[e]]:
            continue
        segs.append((int(e), int(conj[e])))
    return segs, alive, conj


def write_gfa(path: str, g: Graph) -> None:
    segs, alive, conj = _segments(g)
    seg_of = {}      # edge id -> (segment name, orientation char)
    names = {}
    for i, (e, ce) in enumerate(segs, start=1):
        seg_of[e] = (i, "+")
        seg_of[ce] = (i, "-")
        names[i] = e

    starts = np.asarray(g.seq_start)
    lens = np.asarray(g.seq_len)
    covs = np.asarray(g.cov)
    flat = dna.pull_codes_packed(g.seq_flat)
    start_v = np.asarray(g.start_v)
    end_v = np.asarray(g.end_v)
    k = g.k

    with open(path, "w") as f:
        f.write("H\tVN:Z:1.0\n")
        for i, (e, _) in enumerate(segs, start=1):
            seq = dna.decode_codes(flat[starts[e]:starts[e] + lens[e]])
            # KC = total k-mer count (reference writes KC:i: on segments)
            kc = int(round(covs[e] * max(lens[e] - k, 1)))
            f.write(f"S\t{i}\t{seq}\tDP:f:{covs[e]:.6f}\tKC:i:{kc}\n")
        # links: for each vertex, incoming x outgoing
        by_start = {}
        for e in np.nonzero(alive)[0]:
            by_start.setdefault(int(start_v[e]), []).append(int(e))
        emitted = set()
        for e in np.nonzero(alive)[0]:
            v = int(end_v[e])
            for e2 in by_start.get(v, []):
                s1, o1 = seg_of[int(e)]
                s2, o2 = seg_of[e2]
                key = (s1, o1, s2, o2)
                # the conjugate link (rc pair) is the same GFA link
                flip = {"+": "-", "-": "+"}
                rkey = (s2, flip[o2], s1, flip[o1])
                if key in emitted or rkey in emitted:
                    continue
                emitted.add(key)
                f.write(f"L\t{s1}\t{o1}\t{s2}\t{o2}\t{k}M\n")


def read_gfa(path: str):
    """Minimal GFA reader (segments + links), for --assembly-graph input
    (the fork's load_graph stage, projects/spades/load_graph.cpp:16).

    Returns (segments: dict name -> (seq, cov), links: list of
    (name1, orient1, name2, orient2, overlap)).
    """
    segments = {}
    links = []
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if not parts:
                continue
            if parts[0] == "S":
                name, seq = parts[1], parts[2]
                cov = 0.0
                for tag in parts[3:]:
                    if tag.startswith("DP:f:"):
                        cov = float(tag[5:])
                    elif tag.startswith("KC:i:") and cov == 0.0:
                        cov = float(tag[5:]) / max(len(seq), 1)
                segments[name] = (seq, cov)
            elif parts[0] == "L":
                ov = int(parts[5].rstrip("M")) if len(parts) > 5 else 0
                links.append((parts[1], parts[2], parts[3], parts[4], ov))
    return segments, links
