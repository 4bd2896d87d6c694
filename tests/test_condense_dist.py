"""Distributed (GSPMD-sharded) chain contraction vs single-device."""

import numpy as np
import jax.numpy as jnp

from spades_for_blackbird_tpu.graph.pointer_jump import contract_chains
from spades_for_blackbird_tpu.parallel import (condense_dist,
                                               mesh as mesh_mod)


def build_case(N, seed, with_cycle=False):
    rng = np.random.default_rng(seed)
    succ = np.full(N, N, np.int32)
    conj = np.arange(N, dtype=np.int32) ^ 1
    valid = np.ones(N, bool)
    perm = rng.permutation(np.arange(8, N, 2))  # reserve 0..7
    for a, b in zip(perm[:-1:2], perm[1::2]):
        succ[a] = b
        succ[b ^ 1] = a ^ 1
    if with_cycle:
        # conjugate-symmetric 3-cycle among the reserved elements
        a, b, c = 0, 2, 4
        succ[a], succ[b], succ[c] = b, c, a
        succ[b ^ 1], succ[c ^ 1], succ[a ^ 1] = a ^ 1, b ^ 1, c ^ 1
    return succ, conj, valid


def test_sharded_contraction_matches():
    import jax
    assert len(jax.devices()) >= 8
    mesh = mesh_mod.make_mesh(8)
    for seed, cyc in ((0, False), (1, True)):
        succ, conj, valid = build_case(1024, seed, with_cycle=cyc)
        single = contract_chains(jnp.asarray(succ), jnp.asarray(conj),
                                 jnp.asarray(valid))
        shard = condense_dist.contract_chains_sharded(mesh, succ, conj,
                                                      valid)
        for name in ("rep", "off", "is_start", "cyclic"):
            np.testing.assert_array_equal(
                np.asarray(getattr(single, name)),
                np.asarray(getattr(shard, name)), err_msg=name)
