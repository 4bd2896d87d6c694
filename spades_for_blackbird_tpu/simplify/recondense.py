"""Re-condensation: merge chains of alive edges after deletions.

Replaces the reference's incremental compression machinery (``Compressor``
at assembler/src/common/modules/simplification/compressor.hpp:11 +
``CompressAllVertices`` at common/stages/simplification.cpp:475, and the
ObservableGraph action handlers that keep structures coherent during
mutation): after simplification passes mask edges dead, we re-contract
every non-branching chain of surviving edges with the shared
pointer-jumping kernel (graph/pointer_jump.py).

Merged sequences overlap by k bases; coverage merges (k+1)-mer-weighted
(matching the reference's coverage semantics on MergePath).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..graph import pointer_jump
from ..graph.graph import FLANKING_RANGE, Graph, edge_mask


@functools.partial(jax.jit, static_argnames=("v_space",))
def recondense(g: Graph, v_space: int) -> Graph:
    """Contract non-branching chains of alive edges into single edges.

    ``v_space`` must upper-bound oriented vertex ids (2 * k-mer vertex
    table capacity). Capacities are preserved; the merged chain reuses its
    start edge's slot, followers become dead slots.
    """
    E = g.capacity
    FLAT = g.seq_flat.shape[0]
    NONE = jnp.int32(E)
    idx = jnp.arange(E, dtype=jnp.int32)
    m = edge_mask(g)
    one = m.astype(jnp.int32)

    # vertex degrees + unique out-edge per vertex (over alive edges)
    vs = jnp.where(m, g.start_v, v_space)
    ve = jnp.where(m, g.end_v, v_space)
    out_deg = jnp.zeros((v_space,), jnp.int32).at[vs].add(one, mode="drop")
    in_deg = jnp.zeros((v_space,), jnp.int32).at[ve].add(one, mode="drop")
    out_edge = jnp.full((v_space,), NONE).at[vs].min(idx, mode="drop")

    vsafe = jnp.minimum(g.end_v, v_space - 1)
    can_link = m & (out_deg[vsafe] == 1) & (in_deg[vsafe] == 1)
    succ = jnp.where(can_link, out_edge[vsafe], NONE)
    succ = jnp.where(succ == idx, NONE, succ)  # self-loop guard

    chains = pointer_jump.contract_chains(succ, g.conj, m)
    rep, off, is_start = chains.rep, chains.off, chains.is_start
    rep_safe = jnp.where(m, rep, E)

    # per-edge base contribution: start contributes len, follower len - k
    contrib = jnp.where(m, g.seq_len - g.k, 0)
    merged_len = jnp.zeros((E,), jnp.int32).at[rep_safe].add(
        contrib, mode="drop") + jnp.where(is_start, g.k, 0)

    # coverage: weight = number of (k+1)-mers = len - k
    w = jnp.where(m, (g.seq_len - g.k).astype(jnp.float32), 0.0)
    cov_num = jnp.zeros((E,), jnp.float32).at[rep_safe].add(g.cov * w,
                                                           mode="drop")
    cov_den = jnp.zeros((E,), jnp.float32).at[rep_safe].add(w, mode="drop")
    new_cov = jnp.where(cov_den > 0, cov_num / jnp.maximum(cov_den, 1e-9),
                        0.0)

    chain_len = jnp.zeros((E,), jnp.int32).at[rep_safe].max(off + 1,
                                                            mode="drop")
    is_last = m & (off == chain_len[jnp.minimum(rep, E - 1)] - 1)
    last_edge = jnp.zeros((E,), jnp.int32).at[
        jnp.where(is_last, rep, E)].max(idx, mode="drop")
    new_end_v = g.end_v[jnp.minimum(last_edge, E - 1)]
    # conjugate of merged(start..last) = the chain starting at conj(last)
    new_conj = g.conj[jnp.minimum(last_edge, E - 1)]

    # exclusive prefix of contrib along chains = base offset of each source
    # edge within its merged sequence
    succ_broken = jnp.where(
        is_start[jnp.minimum(succ, E - 1)] & (succ < E), NONE, succ)
    bases_before = pointer_jump.chain_exclusive_sum(
        succ_broken, is_start, m, contrib)

    # flanking coverage merge (detail_coverage.hpp HandleMerge): each
    # source edge contributes its flank average over the slice of the
    # FLANKING_RANGE window it occupies (bases_before = its k-mer offset
    # within the merged chain)
    if g.flank is not None:
        window = jnp.clip(FLANKING_RANGE - bases_before, 0, contrib)
        flank_raw = jnp.zeros((E,), jnp.float32).at[rep_safe].add(
            g.flank * window.astype(jnp.float32), mode="drop")
        new_flank = flank_raw / jnp.maximum(
            jnp.minimum(merged_len - g.k, FLANKING_RANGE), 1
        ).astype(jnp.float32)
    else:
        new_flank = None

    # new tightly-packed flat layout (id order == position order invariant)
    survives = is_start
    new_len_if = jnp.where(survives, merged_len, 0)
    csum = jnp.cumsum(new_len_if)
    new_seq_start = jnp.where(survives, csum - new_len_if, 0)

    # map every old flat slot -> owning edge (scan-free; graph.py
    # slot_owner — associative_scan never compiles at multi-Mb FLAT)
    from ..graph.graph import slot_owner
    slot_edge = slot_owner(g.seq_start, m, FLAT)
    se = jnp.maximum(slot_edge, 0)
    pos_in_edge = jnp.arange(FLAT) - g.seq_start[se]
    in_edge = (slot_edge >= 0) & (pos_in_edge >= 0) & \
        (pos_in_edge < g.seq_len[se]) & m[se]
    dst = new_seq_start[jnp.minimum(rep_safe[se], E - 1)] + \
        bases_before[se] + pos_in_edge
    dst = jnp.where(in_edge, dst, FLAT)
    new_flat = jnp.zeros((FLAT,), jnp.uint8).at[dst].set(g.seq_flat,
                                                         mode="drop")

    return Graph(
        seq_flat=new_flat,
        seq_start=new_seq_start,
        seq_len=new_len_if,
        cov=jnp.where(survives, new_cov, 0.0),
        start_v=jnp.where(survives, g.start_v, 0),
        end_v=jnp.where(survives, new_end_v, 0),
        conj=jnp.where(survives, new_conj, 0),
        alive=survives,
        num_edges=g.num_edges,
        k=g.k,
        flank=(None if new_flank is None
               else jnp.where(survives, new_flank, 0.0)),
    )
