"""Benchmark harness: PCG inner iterations/s on image_warping (the
BASELINE.json north-star metric: "PCG inner iters/s + time-to-target-energy
on image_warping and bundle_adjustment").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline normalizes against 1000 PCG iters/s on 512x512 image_warping
(both unknowns, GN, matrix-free) — the order of magnitude of hand-tuned
GPU solvers on this workload; the reference repo commits no numbers
(BASELINE.md), so this is the operational stand-in.
"""
import json
import sys
import time

import jax

BASELINE_PCG_ITERS_PER_S = 1000.0


def bench_image_warping(W=512, H=512, n_steps=32, l_iters=16):
    from thallo_tpu.models import image_warping

    spec = image_warping.make_spec()
    plan = spec.plan({"W": W, "H": H}, solver="gauss_newton")
    plan.set_solver_parameter("nIterations", 10_000)
    plan.set_solver_parameter("lIterations", l_iters)
    inputs = image_warping.synthetic_inputs(W, H, w_fit=100.0, w_reg=0.01)
    plan.init(inputs)

    # warm up (compiles the donated fast-path executable)
    plan.run_steps(1)
    jax.block_until_ready(plan._U)

    t0 = time.perf_counter()
    plan.run_steps(n_steps)  # donated tight loop (GN has no device stop)
    jax.block_until_ready(plan._U)
    dt = time.perf_counter() - t0

    pcg_iters = n_steps * l_iters
    return pcg_iters / dt


def bench_bundle_adjustment(n_cameras=64, n_points=8192, n_steps=6, l_iters=16):
    """The second north-star workload (BASELINE.json): Snavely BA."""
    from thallo_tpu.models import bundle_adjustment as ba

    inputs, _ = ba.synthetic_inputs(n_cameras=n_cameras, n_points=n_points, obs_per_point=4)
    O = len(inputs["oToC"])
    spec = ba.make_spec()
    plan = spec.plan({"C": n_cameras, "P": n_points, "O": O}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 10_000)
    plan.set_solver_parameter("lIterations", l_iters)
    plan.set_solver_parameter("q_tolerance", 0.0)  # keep the inner loop full
    plan.set_solver_parameter("function_tolerance", 0.0)
    plan.init(inputs)
    plan.step()
    jax.block_until_ready(plan._U)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        plan.step()  # LM reads the device-side stop flag each step
    jax.block_until_ready(plan._U)
    dt = time.perf_counter() - t0
    return n_steps * l_iters / dt, O


def main():
    try:
        v = bench_image_warping()
        out = {
            "metric": "image_warping_512_pcg_iters_per_s",
            "value": round(v, 2),
            "unit": "PCG iters/s",
            "vs_baseline": round(v / BASELINE_PCG_ITERS_PER_S, 4),
        }
        try:
            ba_v, n_obs = bench_bundle_adjustment()
            out["extra"] = {
                "bundle_adjustment_pcg_iters_per_s": round(ba_v, 2),
                "bundle_adjustment_observations": n_obs,
            }
        except Exception as e:  # noqa: BLE001
            out["extra"] = {"bundle_adjustment_error": str(e)[:120]}
    except Exception as e:  # noqa: BLE001
        out = {
            "metric": "image_warping_512_pcg_iters_per_s",
            "value": 0.0,
            "unit": "PCG iters/s",
            "vs_baseline": 0.0,
            "error": str(e)[:200],
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
