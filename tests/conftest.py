"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh (real
multi-chip TPU hardware is not available in CI); bench.py uses the real
TPU chip.
"""

import os
import sys

# The container pins JAX_PLATFORMS=axon (tunneled single TPU chip) via
# sitecustomize; tests must run on local CPU — blank PALLAS_AXON_POOL_IPS so
# sitecustomize skips axon registration, and force the platform (plain
# setdefault would lose to the baked env).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
