"""Distributed chain contraction (condensation) over a device mesh.

The single-shard pointer-jumping machinery (graph/pointer_jump.py)
contracts unitig chains in O(log N) gather rounds.  Distributed, each
round's ``par[par]`` is a cross-shard gather; instead of hand-writing a
request/response exchange, the arrays are hash-partitioned with
``NamedSharding`` and the jitted program lets GSPMD insert the
collectives (the scaling-book recipe: pick a mesh, annotate shardings,
let XLA place all_gathers) — the de Bruijn analogue of embedding-table
lookups in sharded training steps.

This covers SURVEY.md §2.13's "pointer-jumping/prefix-doubling
collectives instead of pointer-chasing unitig extraction" at the
multi-chip level; kmer_exchange.py and construction.py feed it
hash-partitioned (k+1)-mer and vertex tables.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.pointer_jump import Chains, contract_chains
from .mesh import READS_AXIS


def contract_chains_sharded(mesh: Mesh, succ, conj, valid) -> Chains:
    """contract_chains with inputs/outputs sharded over the mesh.

    Inputs are (N,) arrays with N a multiple of the mesh size (pad with
    invalid elements: succ == N, valid == False).
    """
    sh = NamedSharding(mesh, P(READS_AXIS))
    import jax.numpy as jnp
    succ = jax.device_put(jnp.asarray(succ), sh)
    conj = jax.device_put(jnp.asarray(conj), sh)
    valid = jax.device_put(jnp.asarray(valid), sh)

    fn = jax.jit(contract_chains,
                 out_shardings=Chains(rep=sh, off=sh, is_start=sh,
                                      cyclic=sh))
    return fn(succ, conj, valid)
