"""Sharded extension-index (vertex table) build on the virtual 8-device
CPU mesh: counting all_to_all -> (k-mer, mask-bit) all_to_all ->
per-shard reduce, validated against the single-shard builder."""

import numpy as np
import pytest

from spades_for_blackbird_tpu.kmers import counter, extension
from spades_for_blackbird_tpu.ops import dna
from spades_for_blackbird_tpu.parallel import (construction, kmer_exchange,
                                               mesh as mesh_mod)

K = 21


def test_sharded_vertex_table_matches_single_shard():
    import jax
    assert len(jax.devices()) >= 8
    mesh = mesh_mod.make_mesh(8)
    rng = np.random.default_rng(7)
    genome = "".join(rng.choice(list("ACGT"), size=600))
    seqs = [genome[i:i + 70] for i in range(0, 530, 3)]
    codes, lengths = dna.encode_reads(seqs)

    # single-shard truth
    kp1 = counter.count_kmers(codes, lengths, K + 1)
    vt = extension.build_vertex_table(kp1, K)
    n = int(vt.num)
    truth = {}
    uk = np.asarray(dna.unpack_kmers(vt.kmers[:n], K))
    for i in range(n):
        truth[dna.decode_codes(uk[i])] = (int(vt.out_mask[i]),
                                          int(vt.in_mask[i]))

    # sharded: count (k+1)-mers, then build vertex shards
    scodes, slengths = mesh_mod.shard_reads(mesh, codes, lengths)
    # duplicate k-mers all hash to one owner -> skewed destinations;
    # raise the per-destination capacity headroom accordingly
    count = kmer_exchange.make_sharded_counter(mesh, K + 1,
                                               capacity_factor=6.0)
    kp1_kmers, kp1_counts, kp1_nums, dropped = count(scodes, slengths)
    assert int(np.asarray(dropped).sum()) == 0
    build = construction.make_sharded_vertex_builder(mesh, K)
    vk, om, im, nums, vdrop = build(kp1_kmers, kp1_nums)
    assert int(np.asarray(vdrop).sum()) == 0

    vk = np.asarray(vk)
    om = np.asarray(om)
    im = np.asarray(im)
    nums = np.asarray(nums)
    got = {}
    per = vk.shape[0] // 8
    for d in range(8):
        lo = d * per
        nd = int(nums[d])
        if nd == 0:
            continue
        uk = np.asarray(dna.unpack_kmers(vk[lo:lo + nd], K))
        for i in range(nd):
            km = dna.decode_codes(uk[i])
            assert km not in got, "k-mer owned by two shards"
            got[km] = (int(om[lo + i]), int(im[lo + i]))
        # shard-local rows are sorted
        rows = vk[lo:lo + nd]
        assert all(tuple(rows[i]) <= tuple(rows[i + 1])
                   for i in range(nd - 1))
    assert got == truth

    # gather back into a VertexTable usable by the single-shard condenser
    gvt = construction.gather_vertex_table(vk, om, im, nums, K)
    assert int(gvt.num) == n
    np.testing.assert_array_equal(np.asarray(gvt.kmers)[:n],
                                  np.asarray(vt.kmers)[:n])
    np.testing.assert_array_equal(np.asarray(gvt.out_mask)[:n],
                                  np.asarray(vt.out_mask)[:n])
    np.testing.assert_array_equal(np.asarray(gvt.in_mask)[:n],
                                  np.asarray(vt.in_mask)[:n])


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
