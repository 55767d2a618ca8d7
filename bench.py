"""Benchmark: end-to-end Spartan prover wall time on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Mirrors the reference benchmark harness (src/benchmark.rs:52-79: setup/index/
prove/serialize/verify with timers + proof-size print). The reference
publishes no numbers and cannot run here (no Rust toolchain — BASELINE.md),
so vs_baseline compares against an *analytic* single-core Rust ESTIMATE for
the same circuit, built from arkworks-era per-op costs (documented in
``rust_single_core_estimate_s``); the "baseline_kind" key labels this.

Driver-budget design (round-1 failure mode was rc=124 on a cold machine):
the parent escalates through sizes 2^6 -> 2^8 -> ... each in its OWN
subprocess with a hard timeout carved from a global budget
(SPARTAN_BENCH_BUDGET_S, default 1500 s). Whatever largest size completes in
time is reported; a partial run still emits a valid JSON line. Compiles are
persistently cached (/root/.cache/jax) so in-round pre-warming accelerates
the driver's end-of-round run when the cache survives.

Environment knobs:
  SPARTAN_BENCH_BUDGET_S  global wall budget in seconds (default 1500)
  SPARTAN_BENCH_SIZES     comma list of log_n to escalate through (default 6,8,10,12)
  SPARTAN_BENCH_REPS      timed prove repetitions after warmup (default 1)
  SPARTAN_BENCH_LOGN      (child mode / pinned) run exactly one size
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def rust_single_core_estimate_s(log_n: int, nnz: int) -> float:
    """Analytic single-core arkworks (2020) prover ESTIMATE for this circuit.

    Per-op costs (conservative, from published arkworks-era BLS12-381 CPU
    numbers): Fr mul ~35ns; Pippenger ~ k * 255/log2(k) point-adds at
    ~1.1us/add (G1), G2 ~2.5x. Phases (SURVEY.md §3.1 / BASELINE.md):
      commit: n-point G1 MSM;  open x2: G2 MSMs of sizes 2..n (~2n points);
      sumcheck1 (factored eq): ~ n*(log_n+3)*(log_n+2) Fr muls;
      sumcheck2: ~6n muls; spmv: ~2*nnz muls x4.
    """
    n = 1 << log_n
    fr_mul = 35e-9
    padd = 1.1e-6
    g1_msm = lambda k: k * 255 / max(4, (k).bit_length()) * padd
    g2_msm = lambda k: 2.5 * g1_msm(k)
    commit = g1_msm(n)
    opens = 2 * sum(g2_msm(1 << k) for k in range(1, log_n + 1))
    sc1 = n * (log_n + 3) * (log_n + 2) * fr_mul
    sc2 = 6 * n * fr_mul
    spmv = 8 * nnz * fr_mul
    return commit + opens + sc1 + sc2 + spmv


def run_single(log_n: int) -> dict:
    """Run setup/index/prove/verify at one size; return the result dict."""
    import random

    import jax

    # Backend-specific cache dir: the axon backend caches XLA AOT results
    # compiled on the tunnel server; loading those from a local CPU process
    # hangs. Keep the caches separate.
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
        try:
            persist.save_keys(cache, pp, vp)
        except OSError:
            pass
    setup_s = time.perf_counter() - t0

    pk = MLArgumentForR1CS.index(a, b, c)

    # warmup (compiles; persistent-cached for future runs)
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
        "baseline_kind": "analytic-rust-single-core-estimate",
    }
    # context lines on stderr (driver reads the single stdout JSON line)
    print(
        f"# logn={log_n} setup={setup_s:.2f}s warmup_prove={warm_s:.2f}s "
        f"prove={prove_s:.2f}s verify={verify_s:.2f}s proof={proof_bytes}B "
        f"nnz={nnz} rust_est={rust_est:.3f}s devices={jax.devices()}",
        file=sys.stderr,
    )
    return result


def main():
    if "SPARTAN_BENCH_LOGN" in os.environ:
        # child / pinned mode: exactly one size, JSON on stdout
        print(json.dumps(run_single(int(os.environ["SPARTAN_BENCH_LOGN"]))))
        return

    budget = float(os.environ.get("SPARTAN_BENCH_BUDGET_S", "1500"))
    sizes = [
        int(s)
        for s in os.environ.get("SPARTAN_BENCH_SIZES", "6,8,10,12").split(",")
    ]
    deadline = time.monotonic() + budget

    best = None
    last_dur = 0.0
    for log_n in sizes:
        remaining = deadline - time.monotonic()
        # escalate only if the next size plausibly fits: sizes are ~2-4x
        # apart in work but compile dominates cold; require 1.5x last run
        if best is not None and remaining < max(60.0, 1.5 * last_dur):
            break
        if remaining <= 10:
            break
        env = dict(os.environ, SPARTAN_BENCH_LOGN=str(log_n))
        t0 = time.monotonic()
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            env=env,
            start_new_session=True,
        )
        try:
            out, _ = proc.communicate(timeout=remaining)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except OSError:
                pass
            proc.wait()
            print(f"# size 2^{log_n} exceeded budget; stopping", file=sys.stderr)
            break
        last_dur = time.monotonic() - t0
        if proc.returncode != 0:
            print(f"# size 2^{log_n} failed rc={proc.returncode}", file=sys.stderr)
            break
        try:
            line = out.decode().strip().splitlines()[-1]
            best = json.loads(line)
        except (IndexError, ValueError):
            print(f"# size 2^{log_n}: no JSON output", file=sys.stderr)
            break

    if best is None:
        best = {
            "metric": "prove_wall_s",
            "value": -1,
            "unit": "s",
            "vs_baseline": 0,
            "baseline_kind": "analytic-rust-single-core-estimate",
            "note": "no size completed within budget",
        }
    print(json.dumps(best))


if __name__ == "__main__":
    main()
