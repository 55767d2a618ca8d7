"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use XLA's
host-platform device virtualization instead (the driver separately dry-runs
the multi-chip path via __graft_entry__.dryrun_multichip).

Note: the ambient environment pins JAX_PLATFORMS=axon (the remote TPU
tunnel), so we must override it explicitly — setdefault is not enough — and
do it before jax initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: must NOT share a cache dir with TPU/axon runs — the axon backend
# caches XLA:CPU AOT results compiled on the tunnel server's CPU, whose
# machine features differ from this host; loading them hangs or SIGILLs.
# Keyed on a machine fingerprint (same scheme as __graft_entry__) so caches
# never cross machines either.
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spartan_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache(jax)
# 8 virtual devices on a small host: async dispatch's inline-thread executor
# deadlocks (observed with while_loop programs on a 2-core machine).
jax.config.update("jax_cpu_enable_async_dispatch", False)
