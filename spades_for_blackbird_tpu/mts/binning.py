"""Binning propagation and read binning (mts prop_binning).

Counterparts of projects/mts/prop_binning.cpp + propagate.cpp (label
propagation of an external binner's annotation over the assembly graph)
and read_binning.cpp (splitting read sets per bin by mapping them onto
annotated edges), plus stats.cpp-style summaries.
"""

from __future__ import annotations

import numpy as np

from ..graph.graph import Graph, edge_mask


def read_annotation(path: str) -> dict[str, str]:
    """'name<TAB>bin' per line (the mts .ann surface)."""
    out = {}
    for line in open(path):
        toks = line.split()
        if len(toks) >= 2:
            out[toks[0]] = toks[1]
    return out


def write_annotation(path: str, ann: dict[str, str]) -> None:
    with open(path, "w") as f:
        for name, b in ann.items():
            f.write(f"{name}\t{b}\n")


def propagate_bins(g: Graph, edge_bins: dict[int, str],
                   max_rounds: int = 10) -> dict[int, str]:
    """Spread bin labels to unlabeled edges: an edge adopts a label when
    all labeled neighbours (edges sharing a vertex, either side) agree
    (propagate.cpp's conservative EdgeAnnotationPropagator idea).
    Conjugate edges always share a label."""
    alive = np.asarray(edge_mask(g))
    start_v = np.asarray(g.start_v)
    end_v = np.asarray(g.end_v)
    conj = np.asarray(g.conj)

    at_vertex: dict[int, list[int]] = {}
    for e in np.nonzero(alive)[0]:
        at_vertex.setdefault(int(start_v[e]), []).append(int(e))
        at_vertex.setdefault(int(end_v[e]), []).append(int(e))

    labels = dict(edge_bins)
    for e in list(labels):
        labels[int(conj[e])] = labels[e]
    for _ in range(max_rounds):
        changed = False
        for e in np.nonzero(alive)[0]:
            e = int(e)
            if e in labels:
                continue
            neigh = set()
            for v in (int(start_v[e]), int(end_v[e])):
                for o in at_vertex.get(v, []):
                    if o != e and o in labels:
                        neigh.add(labels[o])
            if len(neigh) == 1:
                b = neigh.pop()
                labels[e] = b
                labels[int(conj[e])] = b
                changed = True
        if not changed:
            break
    return labels


def bin_reads(g: Graph, edge_bins: dict[int, str], codes, lengths
              ) -> dict[str, np.ndarray]:
    """Read indices per bin, by mapping each read onto the graph and
    looking up its winning edge's bin (read_binning.cpp)."""
    import jax.numpy as jnp
    from ..mapping import index as eidx
    from ..mapping import mapper

    idx = eidx.build_edge_index(g, g.k + 1)
    m = mapper.map_reads(idx, g.seq_len, jnp.asarray(codes),
                         jnp.asarray(lengths), g.k + 1)
    m = mapper.normalize_mapping(m, g.conj)
    oe = np.asarray(m.oriented_edge) // 2
    ok = np.asarray(m.mapped)
    out: dict[str, list[int]] = {}
    for r in np.nonzero(ok)[0]:
        b = edge_bins.get(int(oe[r]))
        if b is not None:
            out.setdefault(b, []).append(int(r))
    return {b: np.asarray(v) for b, v in out.items()}


def binning_stats(g: Graph, edge_bins: dict[int, str]) -> dict[str, dict]:
    """Per-bin edge count / total length / mean coverage (stats.cpp)."""
    alive = np.asarray(edge_mask(g))
    lens = np.asarray(g.seq_len)
    cov = np.asarray(g.cov)
    conj = np.asarray(g.conj)
    stats: dict[str, dict] = {}
    seen = set()
    for e, b in edge_bins.items():
        if not alive[e] or e in seen:
            continue
        seen.add(e)
        seen.add(int(conj[e]))
        s = stats.setdefault(b, {"edges": 0, "length": 0, "cov_sum": 0.0})
        s["edges"] += 1
        s["length"] += int(lens[e])
        s["cov_sum"] += float(cov[e]) * int(lens[e])
    for b, s in stats.items():
        s["mean_cov"] = s.pop("cov_sum") / max(s["length"], 1)
    return stats
