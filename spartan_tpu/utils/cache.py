"""XLA compilation-cache configuration, machine-fingerprinted.

One shared helper for every entry point (bench.py, bench_pc.py, scripts/*,
__graft_entry__). The cache dir is keyed on BOTH the backend and a machine
fingerprint: the axon (tunnel TPU) backend caches XLA:CPU AOT results
compiled on the tunnel server's CPU, and loading those on a different local
CPU produces cpu_aot_loader machine-feature-mismatch errors (observed in
round 2/3 driver runs). Fingerprinting makes stale cross-machine hits
impossible instead of merely unlikely.
"""

from __future__ import annotations

import hashlib
import platform


def machine_fingerprint() -> str:
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


def setup_compile_cache(jax_module) -> str:
    """Point jax at the per-backend persistent compile cache.

    CPU dirs carry the machine fingerprint (XLA:CPU AOT results are
    machine-specific); the tunnel TPU dir stays stable — its entries are
    compiled by the one tunnel server and reused across rounds.
    """
    if jax_module.default_backend() == "cpu":
        path = f"/root/.cache/jax-cpu-{machine_fingerprint()}"
    else:
        path = "/root/.cache/jax"
    jax_module.config.update("jax_compilation_cache_dir", path)
    jax_module.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
