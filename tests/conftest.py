"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual devices so multi-chip sharding paths
(`bevformer_tpu.runtime`) are exercised without TPU hardware, as the driver
does via `__graft_entry__.dryrun_multichip`.
"""

import os

# Force CPU even when the ambient environment selects a TPU platform
# (JAX_PLATFORMS=axon): unit tests must be hardware-independent. The site
# customization partially imports jax at interpreter start, so setting the
# env var alone is not enough — update the jax config explicitly too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the 1-core box compiles the larger test graphs
# (train step, dd3d) in minutes cold — warm re-runs take seconds. The dir
# is HOST-FINGERPRINTED: XLA:CPU AOT entries bake the compiling host's CPU
# features, and loading a foreign-host entry can SIGILL (it segfaulted the
# round-5 full-suite run on entries written by the round-4 machine).
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bevformer_tpu.utils import cpu_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
