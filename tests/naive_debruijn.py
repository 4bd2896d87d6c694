"""Naive Python de Bruijn reference implementation for golden tests.

Plays the role of the reference's test oracles (the C++ tests assert
vertex/edge counts from tiny read sets, e.g.
assembler/src/test/debruijn/construction_test.cpp).
"""

from collections import Counter, defaultdict

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def rc(s):
    return "".join(COMP[c] for c in reversed(s))


def canon(s):
    r = rc(s)
    return s if s <= r else r


def canonical_counts(seqs, k):
    counts = Counter()
    for s in seqs:
        for i in range(len(s) - k + 1):
            km = s[i:i + k]
            if set(km) - set("ACGT"):
                continue
            counts[canon(km)] += 1
    return counts


def vertex_masks(kp1_counts, k):
    """k-mer -> (out set, in set) over both orientations of (k+1)-mers."""
    edges = set()
    for e in kp1_counts:
        edges.add(e)
        edges.add(rc(e))
    out_nbr, in_nbr = defaultdict(set), defaultdict(set)
    for e in edges:
        out_nbr[e[:k]].add(e[k])
        in_nbr[e[1:]].add(e[0])
    return edges, out_nbr, in_nbr


def unitigs(seqs, k):
    """All oriented unitigs (each unitig and its rc both listed), plus
    average (k+1)-mer coverage per unitig."""
    kp1 = canonical_counts(seqs, k + 1)
    edges, out_nbr, in_nbr = vertex_masks(kp1, k)

    def succ(e):
        v = e[1:]
        if len(out_nbr[v]) == 1 and len(in_nbr[v]) == 1:
            return v + next(iter(out_nbr[v]))
        return None

    def pred(e):
        u = e[:k]
        if len(in_nbr[u]) == 1 and len(out_nbr[u]) == 1:
            return next(iter(in_nbr[u])) + u
        return None

    starts = [e for e in edges if pred(e) is None or succ(pred(e)) != e]
    result = []
    visited = set()
    for s0 in sorted(starts):
        seq = s0
        covs = [kp1[canon(s0)]]
        visited.add(s0)
        e = s0
        while True:
            n = succ(e)
            if n is None or n in visited:
                break
            seq += n[k]
            covs.append(kp1[canon(n)])
            visited.add(n)
            e = n
        result.append((seq, sum(covs) / len(covs)))
    # remaining edges are in perfect cycles; report them as leftovers
    leftovers = edges - visited
    return result, leftovers
