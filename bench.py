"""Benchmark: end-to-end Spartan prover wall time on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Mirrors the reference benchmark harness (src/benchmark.rs: setup/index/prove/
serialize/verify sweep with timers + proof-size print). The reference
publishes no numbers and cannot run here (no Rust toolchain — BASELINE.md),
so vs_baseline compares against an *analytic* single-core Rust estimate for
the same circuit, built from arkworks-era per-op costs (documented below).

Environment knobs:
  SPARTAN_BENCH_LOGN   circuit size exponent (default 10)
  SPARTAN_BENCH_REPS   timed prove repetitions after warmup (default 1)
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# Backend-specific cache dir: the axon backend caches XLA:CPU AOT results
# compiled on the tunnel server (different machine features); loading those
# from a local CPU process hangs. Keep the caches separate.
jax.config.update(
    "jax_compilation_cache_dir",
    "/root/.cache/jax-cpu"
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    else "/root/.cache/jax",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from spartan_tpu.host import field as hf
from spartan_tpu.models.synthesizer import generate_circuit_with_random_input
from spartan_tpu.protocol.argument import MLArgumentForR1CS


def rust_single_core_estimate_s(log_n: int, nnz: int) -> float:
    """Analytic single-core arkworks (2020) prover estimate for this circuit.

    Per-op costs (conservative, from published arkworks-era BLS12-381 CPU
    numbers): Fr mul ~35ns; G1 Pippenger MSM ~ (6.2/log2(n))*n us;
    G2 MSM ~2.5x G1. Phases (SURVEY.md §3.1 / BASELINE.md):
      commit: n-point G1 MSM
      open x2: ~2n G2 MSM points total each
      sumcheck1: sum_r cube*(deg+1)*(factors) muls  with factored eq
                 ~ n * (log_n+3) * (log_n+2) muls total (dominant term)
      sumcheck2: ~6n muls; spmv: ~2*nnz muls x4
    """
    n = 1 << log_n
    fr_mul = 35e-9
    g1_msm = lambda k: 6.2e-6 * k / max(1, (k).bit_length() - 1) * (k.bit_length())
    # simpler: Pippenger ~ k * 255/log2(k) point-adds, point-add ~ 1.1us
    padd = 1.1e-6
    g1_msm = lambda k: k * 255 / max(4, (k).bit_length()) * padd
    g2_msm = lambda k: 2.5 * g1_msm(k)
    commit = g1_msm(n)
    opens = 2 * sum(g2_msm(1 << k) for k in range(1, log_n + 1))
    sc1 = n * (log_n + 3) * (log_n + 2) * fr_mul
    sc2 = 6 * n * fr_mul
    spmv = 8 * nnz * fr_mul
    return commit + opens + sc1 + sc2 + spmv


def main():
    log_n = int(os.environ.get("SPARTAN_BENCH_LOGN", "12"))
    reps = int(os.environ.get("SPARTAN_BENCH_REPS", "1"))
    log_v = 2
    rng = random.Random(0)

    num_public = 1 << log_v
    num_private = (1 << log_n) - num_public
    cs, v, w = generate_circuit_with_random_input(
        num_public=num_public, num_private=num_private,
        pad_to_square=True, density=0, rng=rng,
    )
    a, b, c = cs.to_matrices()
    nnz = sum(len(r) for r in a) + sum(len(r) for r in b) + sum(len(r) for r in c)

    class _Rng:
        def __init__(self, seed):
            self._r = random.Random(seed)

        def sample_fr(self):
            return self._r.randrange(hf.R)

    # cache setup keys on disk (mirrors the reference's benchmark_cached_keys
    # file, src/commitment/mod.rs:52-62) so repeat benches skip keygen
    from spartan_tpu.commitment import persist

    cache = f"/root/.cache/spartan_bench_keys_{log_n}.npz"
    t0 = time.perf_counter()
    if os.path.exists(cache):
        pp, vp = persist.load_keys(cache)
    else:
        pp, vp = MLArgumentForR1CS.setup(log_n, _Rng(42))
        persist.save_keys(cache, pp, vp)
    setup_s = time.perf_counter() - t0

    pk = MLArgumentForR1CS.index(a, b, c)

    # warmup (compiles; persistent-cached for future rounds)
    t0 = time.perf_counter()
    proof = MLArgumentForR1CS.prove(pk, v, w, pp)
    warm_s = time.perf_counter() - t0

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        proof = MLArgumentForR1CS.prove(pk, v, w, pp)
        times.append(time.perf_counter() - t0)
    prove_s = min(times)

    proof_bytes = len(proof.serialize())
    t0 = time.perf_counter()
    ok = MLArgumentForR1CS.verify(pk.vk(), v, proof, vp)
    verify_s = time.perf_counter() - t0
    assert ok

    rust_est = rust_single_core_estimate_s(log_n, nnz)
    result = {
        "metric": f"prove_wall_s_2^{log_n}",
        "value": round(prove_s, 4),
        "unit": "s",
        "vs_baseline": round(rust_est / prove_s, 4),
    }
    # context lines on stderr (driver reads the single stdout JSON line)
    print(
        f"# setup={setup_s:.2f}s warmup_prove={warm_s:.2f}s prove={prove_s:.2f}s "
        f"verify={verify_s:.2f}s proof={proof_bytes}B nnz={nnz} "
        f"rust_est={rust_est:.3f}s devices={jax.devices()}",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
