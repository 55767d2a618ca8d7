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
    """Key for the XLA:CPU AOT cache dir: CPU identity AND jaxlib build.

    /proc/cpuinfo alone proved insufficient: the MULTICHIP_r04 failure loaded
    entries whose XLA target config carried pseudo-features (+prefer-no-gather
    etc.) the loading process rejected — an XLA/jaxlib build difference, not a
    CPU one. Entries must never be shared across jaxlib versions.
    """
    bits = [platform.machine(), platform.processor()]
    try:
        import jaxlib

        bits.append(f"jaxlib={jaxlib.__version__}")
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("model name", "flags")):
                    bits.append(line.strip())
                    if len(bits) > 5:
                        break
    except OSError:
        pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def want_cpu_backend() -> bool:
    """True when the environment asks for the CPU backend (virtual-device
    dryruns / tests). Decided from env HINTS, not jax.default_backend():
    the axon TPU plugin force-registers itself even under JAX_PLATFORMS=cpu,
    so default_backend() can report "tpu" while the work runs on the forced
    CPU devices — which routed CPU AOT entries into the shared TPU cache dir
    (the MULTICHIP_r03/r04 poisoning mechanism)."""
    import os

    return (
        os.environ.get("JAX_PLATFORMS", "").split(",")[0] == "cpu"
        or "xla_force_host_platform_device_count"
        in os.environ.get("XLA_FLAGS", "")
    )


def setup_compile_cache(jax_module, backend: str | None = None) -> str:
    """Point jax at the per-backend persistent compile cache.

    CPU dirs carry the machine fingerprint (XLA:CPU AOT results are
    machine- and jaxlib-specific); the tunnel TPU dir stays stable — its
    entries are compiled by the one tunnel server and reused across rounds.
    """
    if backend is None:
        backend = (
            "cpu" if want_cpu_backend() else jax_module.default_backend()
        )
    if backend == "cpu":
        # Make the ACTUAL backend agree with the dir choice: the axon TPU
        # plugin ignores the JAX_PLATFORMS env var (it re-registers itself as
        # default), so an env-hinted "CPU" process could otherwise compile on
        # the tunnel backend and write tunnel-machine XLA:CPU AOT entries
        # into this machine's CPU cache dir (the r4/r5 poisoning mechanism).
        # The config update does stick; harmless when already on CPU.
        try:
            jax_module.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        path = f"/root/.cache/jax-cpu-{machine_fingerprint()}"
    else:
        path = "/root/.cache/jax"
    jax_module.config.update("jax_compilation_cache_dir", path)
    # cache even fast-compiling programs: a cold CPU dryrun issues dozens of
    # ~0.35 s trivial programs (each under the default 1.0 s threshold) that
    # would otherwise recompile in every process, including the driver's
    # timeout-bounded multichip dryrun
    jax_module.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return path
