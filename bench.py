#!/usr/bin/env python
"""Benchmark: canonical k-mer counting throughput on one TPU chip.

North-star metric #1 (BASELINE.md): k-mers/s/chip for the counting engine
that replaces the reference's disk k-mer counter
(utils/kmer_mph/kmer_index_builder.hpp:220-366).

Baseline estimate: the reference counts the isolate dataset's ~2.2e9
(k+1)-mer instances inside its 8-minute 16-thread core run
(/root/reference/README.md:119-128); attributing ~2 minutes to counting
gives ~1.9e7 k-mers/s. ``vs_baseline`` = ours / that estimate.

Runs on the default environment (real TPU chip via axon). Prints ONE JSON
line.
"""

import json
import time

import numpy as np


def main():
    import jax
    from spades_for_blackbird_tpu.utils.jaxcache import (
        enable_compilation_cache)
    enable_compilation_cache()
    from spades_for_blackbird_tpu.kmers import counter

    k = 21
    R, L = 262144, 150
    rng = np.random.default_rng(0)
    codes = jax.device_put(rng.integers(0, 4, (R, L), dtype=np.uint8))
    lengths = jax.device_put(np.full((R,), L, dtype=np.int32))

    @jax.jit
    def step(c, l, salt):
        # salt the input so every iteration is distinct work (guards
        # against dispatch/result caching in remote backends)
        c = (c + salt.astype(jnp.uint8)) % jnp.uint8(4)
        t = counter.count_kmers(c, l, k)
        return t.num

    import jax.numpy as jnp
    int(step(codes, lengths, jnp.int32(0)))  # compile + sync

    # sync via host transfer every iteration: on the tunneled backend,
    # block_until_ready returns at dispatch, not completion — only a
    # device->host read observes the finished computation
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        int(step(codes, lengths, jnp.int32(i + 1)))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    kmers = R * (L - k + 1)
    rate = kmers / dt
    baseline = 1.9e7
    print(json.dumps({
        "metric": "kmer_count_throughput",
        "value": round(rate, 1),
        "unit": "kmers/s/chip",
        "vs_baseline": round(rate / baseline, 3),
    }))


if __name__ == "__main__":
    main()
