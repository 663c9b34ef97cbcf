"""TPU measurement: BA marginal PCG iteration + setup with the round-3
one-hot row mode + transpose-apply + level tables (run on the real chip).

Usage: python scripts/tpu_measure_skew.py [--sizes 32k,250k,1m]
Appends JSON lines to artifacts/tpu_skew.jsonl.
"""
import json
import sys
import time

import jax
import numpy as np


def measure_ba(name, make_inputs, n_cameras, n_points, l_lo=4, l_hi=104,
               n_steps=8, scan_k=4):
    from thallo_tpu.models import bundle_adjustment as ba

    inputs, meta = make_inputs()
    O = len(inputs["oToC"])
    spec = ba.make_spec()
    plan = spec.plan({"C": n_cameras, "P": n_points, "O": O},
                     solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 10_000)
    plan.set_solver_parameter("q_tolerance", -1e30)  # zeta < 0 must not stop the probe
    plan.set_solver_parameter("function_tolerance", 0.0)
    t0 = time.perf_counter()
    plan.init(inputs)
    # BSR-active assertion (the round-2 verdict's "assert it didn't bail")
    bsrs = [c.get("bsr") for c in plan._prep["consts"] if isinstance(c, dict)]
    assert any(b is not None for b in bsrs), f"{name}: BSR path inactive"
    init_s = time.perf_counter() - t0
    plan.steps_per_dispatch = scan_k  # amortize relay dispatch latency
    ts = {}
    for li in (l_lo, l_hi):
        plan.set_solver_parameter("lIterations", li)
        plan.init(inputs)
        plan.run_steps(scan_k)
        jax.block_until_ready(plan._U)
        best = float("inf")
        for _ in range(3):
            plan.init(inputs)
            plan.run_steps(scan_k)  # settle
            jax.block_until_ready(plan._U)
            it0 = int(plan._lm.n_iter)
            t0 = time.perf_counter()
            plan.run_steps(n_steps)
            jax.block_until_ready(plan._U)
            w = time.perf_counter() - t0
            done = max(int(plan._lm.n_iter) - it0, 1)
            best = min(best, w / done)
        ts[li] = best
    marg_ms = (ts[l_hi] - ts[l_lo]) / (l_hi - l_lo) * 1e3
    fixed_ms = (ts[l_lo] - l_lo * marg_ms / 1e3) * 1e3
    from thallo_tpu.utils.roofline import roofline
    roof = roofline(plan, max(marg_ms, 1e-6) / 1e3)
    rec = {"name": name, "O": O, "marginal_pcg_iter_ms": round(marg_ms, 4),
           "fixed_step_ms": round(fixed_ms, 3),
           "iters_per_s_l16": round(16.0 / (ts[l_lo] + (16 - l_lo) * marg_ms / 1e3), 1),
           "init_s": round(init_s, 2), **roof}
    print(json.dumps(rec), flush=True)
    with open("artifacts/tpu_skew.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main():
    from thallo_tpu.models import bundle_adjustment as ba

    cases = {
        "ba_uniform_32k": (lambda: ba.synthetic_inputs(64, 8192, 4), 64, 8192),
        "ba_uniform_250k": (lambda: ba.synthetic_inputs(256, 62500, 4), 256, 62500),
        "ba_skew_250k": (lambda: ba.skewed_inputs(256, 62500, 250_000), 256, 62500),
        "ba_uniform_1m": (lambda: ba.synthetic_inputs(1024, 250000, 4), 1024, 250000),
        "ba_skew_1m": (lambda: ba.skewed_inputs(1024, 250000, 1_000_000), 1024, 250000),
    }
    sel = sys.argv[1].split(",") if len(sys.argv) > 1 else list(cases)
    for name in sel:
        mk, C, P = cases[name]
        try:
            measure_ba(name, mk, C, P)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"name": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
