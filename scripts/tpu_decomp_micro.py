"""A/B micro: fused pair kernel with vs without the two-digit id
decomposition (THALLO_FUSED_DECOMP), at the BA shapes where the one-hot
GENERATION cost dominates (PERF.md r4 micro-study: S*W*N VPU compares).

Runs each variant in a fresh subprocess (the flag is read at trace time)
inside a scan loop to mimic the PCG while-body dispatch.

Usage: python scripts/tpu_decomp_micro.py           # driver, both variants
       python scripts/tpu_decomp_micro.py one CASE  # worker
Appends JSON lines to artifacts/tpu_decomp.jsonl.
"""
import functools
import json
import os
import subprocess
import sys
import time

CASES = {
    # (Ci, Cj, S, W, N): uniform-1M point-table pair; skew-1M base + tail
    "uniform1m": (3, 9, 1024, 4, 250_000),
    "skew1m_base": (3, 9, 1024, 3, 250_000),
    "skew1m_tail": (3, 9, 1024, 96, 8192),
    "skew250k_base": (3, 9, 256, 3, 62_500),
}


def run_one(case):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from thallo_tpu.ops.fusedpair import fused_pair_apply

    Ci, Cj, S, W, N = CASES[case]
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, S, (W, N)).astype(np.int32))
    blocks = jnp.asarray(rng.normal(size=(W * Ci * Cj, N)).astype(np.float32))
    pcol = jnp.asarray(rng.normal(size=(Cj, S)).astype(np.float32))
    prow = jnp.asarray(rng.normal(size=(Ci, N)).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(pcol, prow, k):
        def body(c, _):
            pc, pr = c
            rows, cols = fused_pair_apply(ids, blocks, pc, pr,
                                          Ci=Ci, Cj=Cj, S=S)
            # feed outputs back so the loop isn't dead-code-eliminated
            return (cols * 1e-6 + pc, rows * 1e-6 + pr), None

        (pc, pr), _ = jax.lax.scan(body, (pcol, prow), None, length=k)
        return pc, pr

    jax.block_until_ready(loop(pcol, prow, 2))
    best = float("inf")
    K = 20
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(pcol, prow, K))
        best = min(best, (time.perf_counter() - t0) / K)
    print(json.dumps({"case": case,
                      "decomp": os.environ.get("THALLO_FUSED_DECOMP", "1"),
                      "per_call_ms": round(best * 1e3, 4)}))


def main():
    out = open("artifacts/tpu_decomp.jsonl", "a")
    for case in CASES:
        for flag in ("0", "1"):
            env = dict(os.environ)
            env["THALLO_FUSED_DECOMP"] = flag
            env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
            r = subprocess.run(
                [sys.executable, __file__, "one", case], env=env,
                capture_output=True, text=True, timeout=1200)
            line = (r.stdout.strip().splitlines() or ["{}"])[-1]
            print(case, flag, line)
            if r.returncode != 0:
                print(r.stderr[-500:])
            else:
                out.write(line + "\n")
    out.close()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(sys.argv[2])
    else:
        main()
