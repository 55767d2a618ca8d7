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
import hashlib  # noqa: E402
import platform  # noqa: E402


def _machine_fingerprint() -> str:
    bits = [platform.machine(), platform.processor()]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("model name", "flags")):
                    bits.append(line.strip())
                    if len(bits) > 4:
                        break
    except OSError:
        pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


jax.config.update(
    "jax_compilation_cache_dir", f"/root/.cache/jax-cpu-{_machine_fingerprint()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# 8 virtual devices on a small host: async dispatch's inline-thread executor
# deadlocks (observed with while_loop programs on a 2-core machine).
jax.config.update("jax_cpu_enable_async_dispatch", False)
