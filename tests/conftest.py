"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh (real
multi-chip TPU hardware is not available in CI); bench.py uses the real
TPU chip.
"""

import os
import sys

# The container pins JAX_PLATFORMS=axon (tunneled single TPU chip) via a
# sitecustomize that registers the axon PJRT plugin AT INTERPRETER
# STARTUP — including a remote-compile hook that also serves XLA:CPU
# compiles from a host with a different CPU feature set (AMX); loading
# its AOT artifacts here SIGSEGVs (reproducibly, in whichever test first
# hits an uncached big compile). Setting env vars in conftest is too
# late: register() already ran. The only reliable guard is to re-exec
# the interpreter with a clean environment before any jax use.
_NEEDS_REEXEC = bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and \
    os.environ.get("_SPBT_TEST_REEXEC") != "1"


def pytest_configure(config):
    # Re-exec after initial-conftest loading so pytest's early fd-level
    # capture is stopped first — exec'ing during conftest import sends
    # the child's entire terminal output into the dead parent's capture
    # tempfile.
    if not _NEEDS_REEXEC:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="",
               PALLAS_AXON_REMOTE_COMPILE="0",
               _SPBT_TEST_REEXEC="1")
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
