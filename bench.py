"""Benchmark: end-to-end Spartan prover wall time on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Mirrors the reference benchmark harness (src/benchmark.rs:52-79: setup/index/
prove/serialize/verify with timers + proof-size print). The reference
publishes no numbers and cannot run here (no Rust toolchain — BASELINE.md),
so vs_baseline compares against an *analytic* single-core Rust ESTIMATE for
the same circuit, built from arkworks-era per-op costs (documented in
``rust_single_core_estimate_s``); the "baseline_kind" key labels this.

Driver-budget design (round 2 lost the budget to a 19-min cold compile of
the smallest size; round 3 lost it to a 462 s cold keygen at 2^6 plus an
ASCENDING ladder that spent the budget before 2^14 started):

- ONE child process runs all sizes so jit programs are shared between sizes
  (per-width sumcheck rounds, fixed-width tail rounds, the Mosaic kernels —
  which the TPU backend does NOT persistently cache, so subprocess-per-size
  would recompile everything every time).
- The ladder is ordered LARGEST-VALUE-FIRST (default 14,16,12): the target
  sizes run before the small ones, so budget expiry costs the least
  interesting rows. Keys for every ladder size are pre-cached on disk
  (persist.save_keys) so no size ever pays cold keygen.
- The child prints one JSON line per completed size immediately (flushed);
  the parent enforces the global budget and reports the LARGEST completed
  size when the budget expires, even if the child died mid-size.
- verify is timed twice: cold (includes one-time compiles) and warm; the
  headline verify_s is the warm number (the reference's verifier never
  pays compiles, so the warm number is the comparable one).

Environment knobs:
  SPARTAN_BENCH_BUDGET_S  global wall budget in seconds (default 1500)
  SPARTAN_BENCH_SIZES     comma list of log_n, run in the given order
                          (default 14,16,12,18 — the proven sizes first,
                          then 2^18 with whatever budget remains; the
                          parent reports the largest COMPLETED size, so a
                          2^18 overrun costs nothing)
  SPARTAN_BENCH_REPS      timed prove repetitions after warmup (default 1)
  SPARTAN_BENCH_DENSITY   circuit density knob (default 0; reference sweeps
                          0..229 — src/benchmark.rs:69-78)
  SPARTAN_BENCH_CHILD     (internal) run the escalation in-process
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


def _result_line(log_n, prove_s, verify_s, proof_bytes, nnz, extras=None):
    rust_est = rust_single_core_estimate_s(log_n, nnz)
    out = {
        "metric": f"prove_wall_s_2^{log_n}",
        "value": round(prove_s, 4),
        "unit": "s",
        "vs_baseline": round(rust_est / prove_s, 4),
        "baseline_kind": "analytic-rust-single-core-estimate",
        "verify_s": round(verify_s, 3),
        "proof_bytes": proof_bytes,
        "rust_est_s": round(rust_est, 3),
        "log_n": log_n,
    }
    if extras:
        out.update(extras)
    return out


def child_main():
    """Escalate through all sizes in ONE process; one JSON line per size."""
    import random

    import jax

    from spartan_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(jax)

    from spartan_tpu.host import field as hf
    from spartan_tpu.models.synthesizer import generate_circuit_with_random_input
    from spartan_tpu.protocol.argument import MLArgumentForR1CS
    from spartan_tpu.commitment import persist

    reps = int(os.environ.get("SPARTAN_BENCH_REPS", "1"))
    sizes = [
        int(s)
        for s in os.environ.get("SPARTAN_BENCH_SIZES", "14,16,12,18").split(",")
    ]
    # density sweep (reference src/benchmark.rs:69-78 sweeps 0..229 at fixed
    # size): SPARTAN_BENCH_DENSITIES=0,64,128,229 crosses every size with
    # every density in ONE process so compiled programs are shared
    densities = [
        int(d)
        for d in os.environ.get(
            "SPARTAN_BENCH_DENSITIES",
            os.environ.get("SPARTAN_BENCH_DENSITY", "0"),
        ).split(",")
    ]
    log_v = 2

    class _Rng:
        def __init__(self, seed):
            self._r = random.Random(seed)

        def sample_fr(self):
            return self._r.randrange(hf.R)

    for log_n, density in [(s_, d_) for s_ in sizes for d_ in densities]:
        rng = random.Random(0)
        num_public = 1 << log_v
        num_private = (1 << log_n) - num_public
        cs, v, w = generate_circuit_with_random_input(
            num_public=num_public, num_private=num_private,
            pad_to_square=True, density=density, rng=rng,
        )
        a, b, c = cs.to_matrices()
        nnz = sum(len(r) for r in a) + sum(len(r) for r in b) + sum(len(r) for r in c)

        # cache setup keys on disk (mirrors the reference's benchmark_cached_keys
        # file, src/commitment/mod.rs:52-62) so repeat benches skip keygen
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

        t0 = time.perf_counter()
        proof = MLArgumentForR1CS.prove(pk, v, w, pp)  # warmup (compiles)
        warm_s = time.perf_counter() - t0

        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            proof = MLArgumentForR1CS.prove(pk, v, w, pp)
            times.append(time.perf_counter() - t0)
        prove_s = min(times)

        proof_bytes = len(proof.serialize())
        vk = pk.vk()
        t0 = time.perf_counter()
        ok = MLArgumentForR1CS.verify(vk, v, proof, vp)  # cold: pays compiles
        verify_cold_s = time.perf_counter() - t0
        assert ok
        t0 = time.perf_counter()
        ok = MLArgumentForR1CS.verify(vk, v, proof, vp)
        verify_s = time.perf_counter() - t0  # warm: the comparable number
        assert ok

        print(
            f"# logn={log_n} density={density} setup={setup_s:.2f}s "
            f"warmup_prove={warm_s:.2f}s prove={prove_s:.2f}s "
            f"verify_warm={verify_s:.2f}s verify_cold={verify_cold_s:.2f}s "
            f"proof={proof_bytes}B nnz={nnz} "
            f"devices={jax.devices()}",
            file=sys.stderr, flush=True,
        )
        extras = {"verify_cold_s": round(verify_cold_s, 3)}
        if density:
            extras["density"] = density
        print(json.dumps(_result_line(log_n, prove_s, verify_s, proof_bytes, nnz,
                                      extras)), flush=True)


def main():
    if os.environ.get("SPARTAN_BENCH_CHILD"):
        child_main()
        return

    budget = float(os.environ.get("SPARTAN_BENCH_BUDGET_S", "1500"))
    deadline = time.monotonic() + budget

    env = dict(os.environ, SPARTAN_BENCH_CHILD="1")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        stdout=subprocess.PIPE,
        stderr=sys.stderr,
        env=env,
        start_new_session=True,
        text=True,
    )

    import selectors

    rows = []
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            break
        if not sel.select(timeout=min(remaining, 5.0)):
            if proc.poll() is not None:
                break
            continue
        chunk = proc.stdout.readline()
        if not chunk:
            break
        line = chunk.strip()
        if not line:
            continue
        try:
            row = json.loads(line)
            rows.append(row)
            print(f"# completed {row['metric']}", file=sys.stderr, flush=True)
        except ValueError:
            pass

    if proc.poll() is None:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except OSError:
            pass
        proc.wait()
        print("# budget expired; reporting largest completed size",
              file=sys.stderr, flush=True)

    if not rows:
        best = {
            "metric": "prove_wall_s",
            "value": -1,
            "unit": "s",
            "vs_baseline": 0,
            "baseline_kind": "analytic-rust-single-core-estimate",
            "note": "no size completed within budget",
        }
    else:
        # headline = LARGEST completed size (the ladder may run out of order)
        best = dict(max(rows, key=lambda r: r.get("log_n", -1)))
        if len(rows) > 1:
            best["rows"] = [
                {k: r.get(k) for k in
                 ("metric", "value", "vs_baseline", "verify_s", "proof_bytes",
                  "density") if k in r}
                for r in rows
            ]
    print(json.dumps(best))


if __name__ == "__main__":
    main()
