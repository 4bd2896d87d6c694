"""Sharded k-mer counting on a virtual 8-device CPU mesh.

Validates the multi-chip path (hash-partition + all_to_all) against the
single-shard counter.
"""

import numpy as np
import pytest

from spades_for_blackbird_tpu.kmers import counter
from spades_for_blackbird_tpu.ops import dna
from spades_for_blackbird_tpu.parallel import kmer_exchange, mesh as mesh_mod


def test_sharded_count_matches_single_shard():
    import jax
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh = mesh_mod.make_mesh(8)
    k = 21
    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("ACGT"), size=80)) for _ in range(64)]
    seqs += seqs[:10]
    codes, lengths = dna.encode_reads(seqs)

    # single-shard truth
    table = counter.count_kmers(codes, lengths, k)
    num = int(table.num)
    expect = {}
    uk = np.asarray(dna.unpack_kmers(table.kmers[:num], k))
    for i in range(num):
        expect[dna.decode_codes(uk[i])] = int(table.counts[i])

    # sharded
    scodes, slengths = mesh_mod.shard_reads(mesh, codes, lengths)
    count = kmer_exchange.make_sharded_counter(mesh, k)
    kmers, counts, nums, dropped = count(scodes, slengths)
    assert int(np.asarray(dropped).sum()) == 0

    kmers = np.asarray(kmers)
    counts = np.asarray(counts)
    nums = np.asarray(nums)
    # stitch shards: each shard's first nums[i] rows are its partition
    got = {}
    shard_rows = kmers.shape[0] // 8
    for d in range(8):
        lo = d * shard_rows
        n = int(nums[d])
        for i in range(n):
            km = dna.decode_codes(
                np.asarray(dna.unpack_kmers(kmers[lo + i][None], k))[0])
            assert km not in got, "k-mer appears in two shards"
            got[km] = int(counts[lo + i])
    assert got == expect


def test_dryrun_multichip():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
