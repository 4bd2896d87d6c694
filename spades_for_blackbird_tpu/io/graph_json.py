"""Assembly-graph JSON export for web visualization.

Counterpart of the reference's webvis/ pipeline (pydot -> JSON graph
viewer) and online_vis picture dumps: emits a D3/cytoscape-style
{nodes, links} document over the conjugate-collapsed graph.
"""

from __future__ import annotations

import json

import numpy as np

from ..graph.graph import Graph, edge_mask
from ..ops import dna


def graph_to_json(g: Graph, max_label_len: int = 12) -> dict:
    from ..ops import dna
    alive = np.asarray(edge_mask(g))
    conj = np.asarray(g.conj)
    starts = np.asarray(g.seq_start)
    lens = np.asarray(g.seq_len)
    covs = np.asarray(g.cov)
    flat = dna.pull_codes_packed(g.seq_flat)
    start_v = np.asarray(g.start_v)
    end_v = np.asarray(g.end_v)

    nodes = []
    vseen = {}
    for e in np.nonzero(alive)[0]:
        for v in (int(start_v[e]), int(end_v[e])):
            if v not in vseen:
                vseen[v] = len(vseen)
                nodes.append({"id": f"v{v}"})
    links = []
    for e in np.nonzero(alive)[0]:
        ce = int(conj[e])
        if ce < e and alive[ce]:
            continue
        head = dna.decode_codes(
            flat[starts[e]:starts[e] + min(int(lens[e]), max_label_len)])
        links.append({
            "id": int(e),
            "source": f"v{int(start_v[e])}",
            "target": f"v{int(end_v[e])}",
            "length": int(lens[e]),
            "coverage": round(float(covs[e]), 2),
            "label": f"{int(lens[e])}bp x{covs[e]:.0f} {head}...",
        })
    return {"nodes": nodes, "links": links, "k": g.k}


def write_graph_json(path: str, g: Graph) -> None:
    with open(path, "w") as f:
        json.dump(graph_to_json(g), f, indent=1)
