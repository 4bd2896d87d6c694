"""Build a Graph from a GFA file.

The fork-critical graph-input path (projects/spades/load_graph.cpp:16-36
LoadGraph stage behind --assembly-graph, using io/graph/gfa_reader.cpp):
segments become conjugate edge pairs with DP/KC coverage, link records
glue edge endpoints into shared vertices (union-find over endpoint
points, mirroring FastGraphFromSequencesConstructor's junction grouping).
"""

from __future__ import annotations

import numpy as np

from ..io import gfa as gfa_io
from ..ops import dna
from .graph import Graph


def graph_from_gfa(path: str, return_names: bool = False):
    """Build the Graph; with ``return_names`` also return
    {forward edge id -> GFA segment name} (edge 2i is segment i forward)."""
    import jax.numpy as jnp
    segments, links = gfa_io.read_gfa(path)
    names = list(segments.keys())
    name_idx = {n: i for i, n in enumerate(names)}
    S = len(names)
    E = 2 * S  # edge 2i = segment forward, 2i+1 = reverse complement
    if S == 0:
        raise ValueError(f"{path}: no segments")

    ks = {ov for *_, ov in links}
    k = ks.pop() if len(ks) == 1 else (max(ks) if ks else 21)

    seqs = []
    covs = np.zeros(E, np.float32)
    for i, n in enumerate(names):
        seq, cov = segments[n]
        seqs.append(seq)
        covs[2 * i] = covs[2 * i + 1] = cov

    def edge_id(name: str, orient: str) -> int:
        return 2 * name_idx[name] + (0 if orient == "+" else 1)

    def conj_edge(e: int) -> int:
        return e ^ 1

    # endpoint points: 2e = start of edge e, 2e+1 = end of edge e
    parent = list(range(2 * E))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for n1, o1, n2, o2, _ in links:
        if n1 not in name_idx or n2 not in name_idx:
            continue
        a = edge_id(n1, o1)
        b = edge_id(n2, o2)
        union(2 * a + 1, 2 * b)            # end(a) == start(b)
        flip = {"+": "-", "-": "+"}
        ca = edge_id(n1, flip[o1])
        cb = edge_id(n2, flip[o2])
        union(2 * cb + 1, 2 * ca)          # conjugate link

    # vertex numbering: conjugate-paired oriented ids. Each endpoint class
    # gets a vertex v; its conjugate class (conj endpoints) gets v^1.
    rep_to_vertex: dict[int, int] = {}
    next_v = 0
    start_v = np.zeros(E, np.int32)
    end_v = np.zeros(E, np.int32)

    def vertex_of(point: int) -> int:
        nonlocal next_v
        r = find(point)
        if r in rep_to_vertex:
            return rep_to_vertex[r]
        # conjugate point of (edge e, start) is (conj e, end) and v.v.
        e, is_end = divmod(point, 2)
        cpoint = 2 * conj_edge(e) + (1 - is_end)
        cr = find(cpoint)
        rep_to_vertex[r] = next_v
        rep_to_vertex[cr] = next_v + 1 if cr != r else next_v
        next_v += 2
        return rep_to_vertex[r]

    for e in range(E):
        start_v[e] = vertex_of(2 * e)
        end_v[e] = vertex_of(2 * e + 1)

    lens = np.array([len(seqs[i // 2]) for i in range(E)], np.int32)
    flat_cap = int(lens.sum())
    seq_flat = np.zeros(flat_cap, np.uint8)
    seq_start = np.zeros(E, np.int32)
    acc = 0
    for e in range(E):
        s = seqs[e // 2]
        codes = dna.encode_str(s)
        if e % 2 == 1:
            codes = np.asarray(dna.revcomp_codes(jnp.asarray(codes)))
        seq_start[e] = acc
        seq_flat[acc:acc + len(codes)] = codes
        acc += len(codes)

    conj = np.array([e ^ 1 for e in range(E)], np.int32)
    g = Graph(
        seq_flat=jnp.asarray(seq_flat),
        seq_start=jnp.asarray(seq_start),
        seq_len=jnp.asarray(lens),
        cov=jnp.asarray(covs),
        start_v=jnp.asarray(start_v),
        end_v=jnp.asarray(end_v),
        conj=jnp.asarray(conj),
        alive=jnp.ones(E, bool),
        num_edges=jnp.asarray(E, jnp.int32),
        k=int(k),
    )
    if return_names:
        return g, {2 * i: n for i, n in enumerate(names)}
    return g
