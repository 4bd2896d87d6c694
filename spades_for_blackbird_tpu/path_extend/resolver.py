"""Repeat resolution: paired-info-guided path extension (exSPAnder).

TPU-native counterpart of the reference's path_extend module
(modules/path_extend/pipeline/launcher.cpp:599 ``PathExtendLauncher``,
``CompositeExtender::GrowAllPaths`` at path_extenders.cpp:32-75,
``SimpleExtensionChooser`` at extension_chooser.hpp:494 and the
path-cover weight counter at weight_counter.hpp:97-360).

Design: the hot data (read mapping, paired histograms) is produced on
device (mapping/, paired/); the extension *control loop* walks the
simplified graph — thousands of edges, not millions — on the host with
vectorized scoring, exactly where the reference itself is serial
(path_extenders.cpp:32). Seeds are all long-enough edges, grown right
then left (via conjugate), with:

- candidate scoring: sum of clustered pair-info weights between path
  edges and the candidate, distance-consistent within the library span;
- ratio filter: extend only when the best candidate beats every
  alternative by ``ratio_threshold`` (ExcludingExtensionChooser logic);
- unique-edge usage registry to stop path collisions
  (UsedUniqueStorage in the reference);
- overlap/dedup removal at the end (overlap_remover.hpp:77).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..graph.graph import Graph, edge_mask


@dataclass
class PEParams:
    seed_min_length: int = 0          # seeds = all edges (pe_resolver.cpp:50)
    unique_edge_length: int = 300     # "long unique" edges claimable once
    weight_threshold: float = 1.0     # min support to extend
    ratio_threshold: float = 2.0      # best/second-best ratio to extend
    max_path_edges: int = 10000
    library_span: int = 1000          # how far back along the path to score


@dataclass
class PathSet:
    """Resolved paths: each a list of edge ids; gaps currently 0."""
    paths: list[list[int]] = field(default_factory=list)


def _adjacency(g: Graph):
    E = g.capacity
    alive = np.asarray(edge_mask(g))
    start_v = np.asarray(g.start_v)
    end_v = np.asarray(g.end_v)
    out_of = {}
    for e in np.nonzero(alive)[0]:
        out_of.setdefault(int(start_v[e]), []).append(int(e))
    return alive, start_v, end_v, out_of


def _pair_lookup(pi_e1, pi_e2, pi_d, pi_w, num):
    """dict (e1, e2) -> [(d, w), ...] from clustered paired index arrays."""
    table = {}
    for i in range(num):
        table.setdefault((int(pi_e1[i]), int(pi_e2[i])), []).append(
            (int(pi_d[i]), float(pi_w[i])))
    return table


def resolve_paths(g: Graph, paired, params: PEParams | None = None
                  ) -> PathSet:
    """Grow seed paths using a clustered PairedIndex ``paired``.

    ``paired`` entries use *oriented edge ids* (2*edge + rc-bit) with
    distances = start-to-start offsets (paired/pair_info.py convention).
    """
    if params is None:
        params = PEParams()
    E = g.capacity
    alive, start_v, end_v, out_of = _adjacency(g)
    conj = np.asarray(g.conj)
    seq_len = np.asarray(g.seq_len)
    k = g.k

    n = int(paired.num)
    pairs = _pair_lookup(np.asarray(paired.e1), np.asarray(paired.e2),
                         np.asarray(paired.dist), np.asarray(paired.weight),
                         n)

    # oriented-edge helpers: oriented id o = 2*e + s; conj-oriented of
    # (e, s) traversal = (conj[e], s) in its own forward sense, so the
    # oriented id used during mapping for edge e traversed forward is 2e.
    def oedge(e):
        return 2 * e

    def support_by_edge(path, starts, cand) -> list[float]:
        """Distance-consistent paired support for appending ``cand``,
        per path edge (for the excluding chooser below)."""
        cand_start = starts[-1] + seq_len[path[-1]] - k
        out = []
        for p, s in zip(path, starts):
            want = cand_start - s
            w = 0.0
            if want <= params.library_span + seq_len[p]:
                for d, ww in pairs.get((oedge(p), oedge(cand)), []):
                    if abs(d - want) <= max(10, 0.2 * max(want, 1)):
                        w += ww
            out.append(w)
        return out

    def choose_scores(path, starts, cands) -> dict:
        """ExcludingExtensionChooser semantics
        (extension_chooser.hpp:416): path edges whose support does not
        discriminate between the candidates (a repeat placed in the path
        supports every continuation equally) are EXCLUDED; candidates
        are compared on the decisive evidence only."""
        per = {c: support_by_edge(path, starts, c) for c in cands}
        decisive = []
        for i in range(len(path)):
            vals = sorted((per[c][i] for c in cands), reverse=True)
            top, second = vals[0], vals[1]
            if top >= params.weight_threshold and \
                    (second == 0 or top / second >= params.ratio_threshold):
                decisive.append(i)
        if decisive:
            return {c: sum(per[c][i] for i in decisive) for c in cands}
        return {c: sum(per[c]) for c in cands}

    # seeds: long edges first (SortByLength, pe_resolver.cpp)
    seeds = [int(e) for e in np.nonzero(alive)[0]
             if seq_len[e] >= params.seed_min_length]
    seeds.sort(key=lambda e: -int(seq_len[e]))

    used_unique = set()  # long edges already claimed by a path
    paths = []
    seeded = set()
    for seed in seeds:
        if seed in seeded or conj[seed] in seeded:
            continue
        if seq_len[seed] >= params.unique_edge_length and \
                (seed in used_unique or int(conj[seed]) in used_unique):
            continue

        def grow(path):
            starts = [0]
            for p in path[1:]:
                starts.append(starts[-1] + int(seq_len[path[len(starts) - 1]]
                                               ) - k)
            while len(path) < params.max_path_edges:
                v = int(end_v[path[-1]])
                cands = [c for c in out_of.get(v, [])
                         if not (seq_len[c] >= params.unique_edge_length and
                                 (c in used_unique or
                                  int(conj[c]) in used_unique))]
                if not cands:
                    break
                if len(cands) == 1:
                    c = cands[0]
                    # unambiguous extension through a junction still needs
                    # the junction to be a real continuation (in-degree 1
                    # handled by condensation; accept)
                    scores = {c: 1.0}
                    best, second = c, None
                else:
                    scores = choose_scores(path, starts, cands)
                    ranked = sorted(scores, key=lambda c: -scores[c])
                    best, second = ranked[0], ranked[1]
                    if scores[best] < params.weight_threshold:
                        break
                    if scores[second] > 0 and \
                            scores[best] / scores[second] < \
                            params.ratio_threshold:
                        break
                if best == path[-1] and len(cands) == 1:
                    break  # tight self-loop
                starts.append(starts[-1] + int(seq_len[path[-1]]) - k)
                path.append(best)
                if seq_len[best] >= params.unique_edge_length:
                    used_unique.add(best)
            return path

        if seq_len[seed] >= params.unique_edge_length:
            used_unique.add(seed)
        # grow right from seed, then grow right from the conjugate (= grow
        # left), then stitch (LoopDetectingPathExtender's bidirectional
        # growth)
        right = grow([seed])
        left_c = grow([int(conj[seed])])
        left = [int(conj[e]) for e in reversed(left_c[1:])]
        full = left + right
        paths.append(full)
        seeded.update(full)
        seeded.update(int(conj[e]) for e in full)

    # dedup: drop paths fully contained in another (path_deduplicator.hpp)
    def sig(p):
        return tuple(p)

    paths.sort(key=len, reverse=True)
    kept = []
    seen_edges = []
    for p in paths:
        contained = False
        sp = sig(p)
        cp = tuple(int(conj[e]) for e in reversed(p))
        for q in kept:
            sq = sig(q)
            if _contains(sq, sp) or _contains(sq, cp):
                contained = True
                break
        if not contained:
            kept.append(p)
    return PathSet(paths=kept)


def _contains(big: tuple, small: tuple) -> bool:
    if len(small) > len(big):
        return False
    for i in range(len(big) - len(small) + 1):
        if big[i:i + len(small)] == small:
            return True
    return False


def paths_to_contigs(g: Graph, ps: PathSet) -> list[tuple[str, float]]:
    """Path sequences (k-overlap aware) with length-weighted coverage."""
    from ..ops import dna
    flat = np.asarray(g.seq_flat)
    starts = np.asarray(g.seq_start)
    lens = np.asarray(g.seq_len)
    covs = np.asarray(g.cov)
    k = g.k
    out = []
    for path in ps.paths:
        seq = ""
        wsum = 0.0
        wlen = 0
        for i, e in enumerate(path):
            s = dna.decode_codes(flat[starts[e]:starts[e] + lens[e]])
            seq = s if i == 0 else seq + s[k:]
            wsum += covs[e] * lens[e]
            wlen += int(lens[e])
        out.append((seq, wsum / max(wlen, 1)))
    out.sort(key=lambda sc: (-len(sc[0]), sc[0]))
    return out
