"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh (real
multi-chip TPU hardware is not available in CI); bench.py uses the real
TPU chip.
"""

import os
import sys

# The container pins JAX_PLATFORMS=axon (tunneled single TPU chip) via a
# sitecustomize that imports jax at interpreter startup, so env vars alone
# are too late here. Backends are not initialized yet at conftest time, so
# overriding the config before the first device use still forces CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
# The axon remote-compile service must not serve CPU compiles: its host
# has a different CPU feature set (AMX/+prefer-no-scatter), and loading
# its XLA:CPU AOT artifacts here intermittently SIGSEGVs
# (cpu_aot_loader feature-mismatch warnings precede the crash).
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
