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

    import jax.numpy as jnp

    k = 21
    R, L = 262144, 150
    rng = np.random.default_rng(0)
    # input A: uniform-random reads (near-zero k-mer duplication)
    codes_u = rng.integers(0, 4, (R, L), dtype=np.uint8)
    # input B: coverage-realistic — reads drawn from a genome at ~40x
    # (the reference's isolate conditions, README.md:90: real read sets
    # hit the counter with coverage-fold duplication)
    G = R * L // 40
    genome = rng.integers(0, 4, G, dtype=np.uint8)
    starts = rng.integers(0, G - L, R)
    codes_c = np.stack([genome[s:s + L] for s in starts])
    lengths_np = np.full((R,), L, dtype=np.int32)

    def bench_one(fn, codes_np):
        codes = jax.device_put(codes_np)
        lengths = jax.device_put(lengths_np)

        @jax.jit
        def step(c, l, salt):
            # salt the input so every iteration is distinct work (guards
            # against dispatch/result caching in remote backends)
            c = (c + salt.astype(jnp.uint8)) % jnp.uint8(4)
            return fn(c, l, k).num

        int(step(codes, lengths, jnp.int32(0)))  # compile + sync
        # sync via host transfer every iteration: on the tunneled
        # backend only a device->host read observes completion
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            int(step(codes, lengths, jnp.int32(i + 1)))
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        return R * (L - k + 1) / dt

    import signal

    def _alarm(sig, frame):
        raise TimeoutError("bench path timed out")

    signal.signal(signal.SIGALRM, _alarm)

    results = {}
    for name, fn in (("xla", counter.count_kmers),
                     ("bitonic", counter.count_kmers_bitonic)):
        for iname, arr in (("uniform", codes_u), ("coverage40x", codes_c)):
            try:
                # hard per-path timeout: a Mosaic kernel stuck in the
                # remote compile service must not sink the whole bench
                signal.alarm(420 if name == "bitonic" else 900)
                results[f"{name}_{iname}"] = round(bench_one(fn, arr), 1)
            except Exception as e:  # keep the bench robust to one path
                results[f"{name}_{iname}"] = f"error: {e}"[:120]
            finally:
                signal.alarm(0)

    numeric = [v for v in results.values() if isinstance(v, float)]
    rate = max(numeric)
    baseline = 1.9e7
    print(json.dumps({
        "metric": "kmer_count_throughput",
        "value": rate,
        "unit": "kmers/s/chip",
        "vs_baseline": round(rate / baseline, 3),
        "detail": results,
    }))


if __name__ == "__main__":
    main()
