"""Parallel chain contraction over a successor array (pointer jumping).

The shared machinery behind unitig condensation (graph/condense.py) and
post-simplification re-condensation (simplify/recondense.py). Replaces the
reference's serial unbranching-path walks
(debruijn_graph_constructor.hpp:182-388) with O(log N) gather rounds.

The element space is "things that chain" (oriented (k+1)-mer instances, or
unitig edges) with:
- ``succ``: unique follower or NONE (= N). Must be *injective* on valid
  elements (guaranteed by 1-in/1-out junction conditions).
- ``conj``: conjugate element (an involution). Used to break cycles
  conjugate-symmetrically: a cycle C and its conjugate cycle rc(C) must
  contract to chains that are exact reverse-complements, so the breakpoint
  is derived from the globally-minimal conjugate-pair key
  (replacing RecoverCircularLoops, debruijn_graph_constructor.hpp:306-345).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Chains(NamedTuple):
    rep: jax.Array       # (N,) chain start (representative) per element
    off: jax.Array       # (N,) offset within chain (start = 0)
    is_start: jax.Array  # (N,) bool
    cyclic: jax.Array    # (N,) bool — element was on a broken cycle


def contract_chains(succ: jax.Array, conj: jax.Array, valid: jax.Array
                    ) -> Chains:
    """Contract all chains/cycles of the functional graph ``succ``.

    succ: (N,) int32 in [0, N]; N = NONE sentinel. Invalid elements must
      have succ == NONE and never be the successor of a valid element.
    conj: (N,) int32 conjugate involution.
    valid: (N,) bool.
    """
    N = succ.shape[0]
    NONE = jnp.int32(N)
    idx = jnp.arange(N, dtype=jnp.int32)
    n_rounds = max(1, N.bit_length())

    pred = jnp.full((N + 1,), NONE).at[succ].set(idx, mode="drop")[:N]

    # cycle detection: doubling; NONE absorbs chains.
    def reach_body(_, r):
        r_pad = jnp.concatenate([r, jnp.array([NONE])])
        return r_pad[r]

    reach = jax.lax.fori_loop(0, n_rounds, reach_body, succ)
    cyclic = (reach != NONE) & valid

    # conjugate-symmetric cycle break:
    #   key(e) = min(e, conj(e)); per cycle find (key*, e*) = argmin;
    #   start = e* if e* < conj(e*) else succ(e*).
    # On the conjugate cycle the same key* selects conj(e*), and
    # succ(conj(e*)) is exactly the conjugate of the chain's last element,
    # so both contractions are mutual reverse-complements.
    key0 = jnp.where(cyclic, jnp.minimum(idx, conj), N)
    arg0 = idx

    def keymin_body(_, state):
        bk, ba, nx = state
        bk_pad = jnp.concatenate([bk, jnp.array([jnp.int32(N)])])
        ba_pad = jnp.concatenate([ba, jnp.array([NONE])])
        nx_pad = jnp.concatenate([nx, jnp.array([NONE])])
        ok, oa = bk_pad[nx], ba_pad[nx]
        take = (ok < bk) | ((ok == bk) & (oa < ba))
        return (jnp.where(take, ok, bk), jnp.where(take, oa, ba),
                nx_pad[nx])

    _, best_arg, _ = jax.lax.fori_loop(0, n_rounds, keymin_body,
                                       (key0, arg0, succ))
    a = jnp.minimum(best_arg, N - 1)
    succ_pad = jnp.concatenate([succ, jnp.array([NONE])])
    start_of_cycle = jnp.where(a < conj[a], a, succ_pad[a])
    break_here = cyclic & (idx == start_of_cycle)
    pred = jnp.where(break_here, NONE, pred)

    # chain contraction by pred doubling
    par = jnp.where(pred == NONE, idx, pred)
    dist = jnp.where(pred == NONE, 0, 1).astype(jnp.int32)

    def jump(_, state):
        par, dist = state
        return par[par], dist + dist[par]

    rep, off = jax.lax.fori_loop(0, n_rounds, jump, (par, dist))
    is_start = (pred == NONE) & valid
    return Chains(rep=rep, off=off, is_start=is_start, cyclic=cyclic)


def chain_exclusive_sum(succ: jax.Array, is_start: jax.Array,
                        valid: jax.Array, values: jax.Array) -> jax.Array:
    """Per-element exclusive prefix sum of ``values`` along each chain.

    Implemented by pred-doubling carrying partial sums. ``succ`` must be
    the *post-break* successor structure consistent with is_start (i.e.
    treat the predecessor of a start as absent).
    """
    N = succ.shape[0]
    NONE = jnp.int32(N)
    idx = jnp.arange(N, dtype=jnp.int32)
    pred = jnp.full((N + 1,), NONE).at[succ].set(idx, mode="drop")[:N]
    pred = jnp.where(is_start, NONE, pred)
    n_rounds = max(1, N.bit_length())

    par = jnp.where(pred == NONE, idx, pred)
    acc = jnp.where(pred == NONE, jnp.zeros_like(values),
                    values[jnp.minimum(pred, N - 1)])

    def jump(_, state):
        par, acc = state
        return par[par], acc + acc[par]

    _, out = jax.lax.fori_loop(0, n_rounds, jump, (par, acc))
    return out
