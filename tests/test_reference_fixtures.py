"""Fixture-driven parity tests against the reference's curated graphs.

The reference's simplification unit tests load graph fragments saved in
a legacy text format and assert the vertex count after running one
cleaner (src/test/debruijn/simplification_test.cpp:147-340).  These
tests load the same fixtures through ``io.legacy_text`` and run our
cleaners with the same parameters, asserting the same final sizes —
parity on the exact structures the reference algorithms were built for.

Parameter provenance:
- tip clipper  "{ tc_lb 2.5, cb 1000., rctc 1.2 }", read_length=100
  (simplification_test.cpp:87-95, 113-117)
- bulge remover: coeff 4, additive 0, max_cov 1000, rel_cov 1.2,
  max_delta 3, rel_delta 0.1 (simplification_test.cpp:21-38)
- EC remover "{ icb 7000, ec_lb 20 }" (simplification_test.cpp:176-214)
- complex bulge remover: max_length = 5*k, max_diff 5
  (simplification_test.cpp:271-300)
- rel-cov component remover: gap 2, length_coeff 2, tip_coeff 2,
  max_ec_coeff 65, max_cov_coeff 10000, vertex_limit 10,
  read_length 100, detected_coverage_bound 10
  (simplification_test.cpp:98-117, 305-340)
"""

import os

import numpy as np
import pytest

FRAG = ("/root/reference/assembler/src/test/debruijn/graph_fragments")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FRAG), reason="reference fixtures unavailable")


def _load(rel):
    from spades_for_blackbird_tpu.io import legacy_text
    return legacy_text.load_legacy_graph(os.path.join(FRAG, rel))


def _n_vertices(g) -> int:
    """Count of live vertices — endpoints of alive edges, conjugates
    counted separately exactly like the reference's ``g.size()``."""
    from spades_for_blackbird_tpu.graph.graph import edge_mask
    m = np.asarray(edge_mask(g))
    vs = np.asarray(g.start_v)[m]
    ve = np.asarray(g.end_v)[m]
    return len(np.unique(np.concatenate([vs, ve])))


def _clip_tips_std(g, v_space):
    """DefaultClipTips: tc_lb 2.5, cb 1000, rctc 1.2, read_length 100."""
    import jax.numpy as jnp
    from spades_for_blackbird_tpu.simplify import passes, recondense
    from spades_for_blackbird_tpu.simplify.runner import _tip_length

    length = _tip_length(g.k, 100, 2.5)
    while True:
        before = _n_alive(g)
        g = passes.clip_tips(g, v_space, jnp.int32(length),
                             jnp.float32(1000.0), jnp.float32(1.2))
        g = recondense.recondense(g, v_space)
        if _n_alive(g) == before:
            return g


def _n_alive(g):
    from spades_for_blackbird_tpu.graph.graph import edge_mask
    return int(np.asarray(edge_mask(g)).sum())


def _remove_bulges_std(g, v_space):
    """DefaultRemoveBulges: max_len 4*k, cov 1000, rel_cov 1.2,
    delta 3, rel_delta 0.1 (standard_br_config_generation)."""
    from spades_for_blackbird_tpu.simplify import advanced, recondense
    while True:
        before = _n_alive(g)
        g, v_space, _ = advanced.remove_path_bulges(
            g, v_space,
            max_length=4 * g.k,
            max_coverage=1000.0,
            max_relative_coverage=1.2,
            max_delta=3,
            max_relative_delta=0.1)
        g = recondense.recondense(g, v_space)
        if _n_alive(g) == before:
            return g, v_space


def test_simple_tip_clipper():
    # simplification_test.cpp:147-154 SimpleTipClipperTest
    g, v_space = _load("simpliest_tip/simpliest_tip")
    assert _n_vertices(g) == 8
    g = _clip_tips_std(g, v_space)
    assert _n_vertices(g) == 4


def test_simple_bulge_removal():
    # simplification_test.cpp:156-163 SimpleBulgeRemovalTest
    g, v_space = _load("simpliest_bulge/simpliest_bulge")
    g, _ = _remove_bulges_std(g, v_space)
    assert _n_vertices(g) == 4


def test_tipobulge():
    # simplification_test.cpp:165-174 TipobulgeTest
    g, v_space = _load("tipobulge/tipobulge")
    g = _clip_tips_std(g, v_space)
    g, _ = _remove_bulges_std(g, v_space)
    assert _n_vertices(g) == 16


def _ec_pass(g, v_space, threshold):
    import jax.numpy as jnp
    from spades_for_blackbird_tpu.simplify import passes, recondense
    # "{ icb 7000, ec_lb 20 }": length bound k+20 in k-mers
    # (MaxErroneousConnectionLength, simplification_settings.hpp:26)
    while True:
        before = _n_alive(g)
        g = passes.remove_erroneous_connections(
            g, v_space, jnp.int32(g.k + 20), jnp.float32(threshold))
        g = recondense.recondense(g, v_space)
        if _n_alive(g) == before:
            return g


def test_simple_ec():
    # simplification_test.cpp:176-186 SimpleECTest
    g, v_space = _load("topology_ec/iter_unique_path")
    g = _ec_pass(g, v_space, 7000.0)
    assert _n_vertices(g) == 16


def test_iterative_ec():
    # simplification_test.cpp:201-214 IterECTest: the iterative
    # coverage ramp (0.5 then 1.0 of icb)
    g, v_space = _load("topology_ec/iter_unique_path")
    g = _ec_pass(g, v_space, 0.5 * 7000.0)
    assert _n_vertices(g) == 20
    g = _ec_pass(g, v_space, 7000.0)
    assert _n_vertices(g) == 16


def test_complex_bulge():
    # simplification_test.cpp:282-291 ComplexBulge: 20 -> 8 vertices
    # (ComplexBulgeRemover with max_length 5*k, max_diff 5)
    g, v_space = _load("complex_bulge/complex_bulge")
    assert _n_vertices(g) == 20
    from spades_for_blackbird_tpu.simplify import advanced, recondense
    from spades_for_blackbird_tpu.simplify import superbubble
    while True:
        before = _n_alive(g)
        g, v_space, _ = advanced.remove_path_bulges(
            g, v_space, max_length=5 * g.k, max_coverage=float("inf"),
            max_relative_coverage=float("inf"), max_delta=5,
            max_relative_delta=0.1)
        g, _ = superbubble.collapse_superbubbles(g, max_length=5 * g.k)
        g = recondense.recondense(g, v_space)
        if _n_alive(g) == before:
            break
    assert _n_vertices(g) == 8


def _rcc(g, v_space):
    from spades_for_blackbird_tpu.simplify import advanced, recondense
    # standard_rcc_config + standard_simplif_relevant_info
    g, v_space, _ = advanced.remove_rcc_components(
        g, v_space,
        coverage_gap=2.0,
        length_bound=int(100 * 2.0),
        tip_allowing_length_bound=int(100 * 2.0),
        longest_connecting_path_bound=g.k + 65,
        max_coverage=10.0 * 10000.0,
        vertex_count_limit=10)
    return recondense.recondense(g, v_space)


def test_topology_ec_iter_unique_path():
    # simplification_test.cpp:217-226 IterUniquePath: topology-based EC
    # removal (uniqueness 1500, plausibility 200, max_ec_length_coeff
    # 20) iterated to fixpoint -> 16 vertices
    g, v_space = _load("topology_ec/iter_unique_path")
    from spades_for_blackbird_tpu.simplify import advanced
    g, v_space, n = advanced.remove_topology_ec(
        g, v_space, max_ec_length=g.k + 20,
        uniqueness_length=1500, plausibility_length=200)
    assert n > 0
    assert _n_vertices(g) == 16


def test_relative_coverage_remover():
    # simplification_test.cpp:320-322: rel_cov_ec -> 12 vertices
    g, v_space = _load("rel_cov_ec/constructed_graph")
    g = _rcc(g, v_space)
    assert _n_vertices(g) == 12


def test_relative_coverage_remover_complex_bulge():
    # simplification_test.cpp:324-326: complex_bulge -> 12 vertices
    g, v_space = _load("complex_bulge/complex_bulge")
    g = _rcc(g, v_space)
    assert _n_vertices(g) == 12


def test_relative_coverage_remover_tipobulge():
    # simplification_test.cpp:332-334: tipobulge -> 4 vertices
    g, v_space = _load("tipobulge/tipobulge")
    g = _rcc(g, v_space)
    assert _n_vertices(g) == 4
