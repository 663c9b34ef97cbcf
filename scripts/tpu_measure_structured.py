"""TPU measurement batch for the structured-index fast path (run when
the axon relay is up).  Measures, on the real chip:

1. ARAP 256x256 (65k verts / 261k edges): marginal PCG iteration and
   per-step time, grid edges (affine plans) vs shuffled edges
   (gather floor) vs THALLO_AFFINE=0 on grid.
2. BA 250k obs: per-step time (setup-dominated) with/without plans.

Appends one JSON line per configuration to artifacts/tpu_structured.jsonl.

Usage: python scripts/tpu_measure_structured.py [--quick]
(THALLO_AFFINE is read at plan time, so each config runs in a
subprocess with the right env.)
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

WORKER = r"""
import json, sys, time
import numpy as np, jax

mode = sys.argv[1]          # arap | ba
shuffle = sys.argv[2] == "1"
side_or_pts = int(sys.argv[3])

if mode == "arap":
    from thallo_tpu.models import arap_mesh_deformation as arap
    side = side_or_pts
    N = side * side
    ai = arap.synthetic_inputs(side=side)
    if shuffle:
        ai = arap.shuffle_edges(ai)
    E = len(ai["V0"])
    spec = arap.make_spec()
    plan = spec.plan({"N": N, "E": E}, solver="gauss_newton")
    plan.set_solver_parameter("nIterations", 10_000)
    plan.init(ai)
    ts = {}
    for li in (10, 110):
        plan.set_solver_parameter("lIterations", li)
        plan.run_steps(1); jax.block_until_ready(plan._U)
        t0 = time.perf_counter(); plan.run_steps(5)
        jax.block_until_ready(plan._U)
        ts[li] = (time.perf_counter() - t0) / 5
    marg = (ts[110] - ts[10]) / 100
    print(json.dumps({"workload": "arap_%dk" % (E // 1000),
                      "step10_ms": round(ts[10] * 1e3, 3),
                      "marginal_pcg_iter_ms": round(marg * 1e3, 4)}))
else:
    from thallo_tpu.models import bundle_adjustment as ba
    n_pts = side_or_pts
    inputs, _ = ba.synthetic_inputs(n_cameras=256, n_points=n_pts,
                                    obs_per_point=4)
    O = len(inputs["oToC"])
    spec = ba.make_spec()
    plan = spec.plan({"C": 256, "P": n_pts, "O": O},
                     solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 10_000)
    plan.set_solver_parameter("lIterations", 16)
    plan.set_solver_parameter("q_tolerance", 0.0)
    plan.set_solver_parameter("function_tolerance", 0.0)
    plan.init(inputs)
    plan.steps_per_dispatch = 4
    plan.run_steps(8); jax.block_until_ready(plan._U)
    it0 = int(plan._lm.n_iter)
    t0 = time.perf_counter(); plan.run_steps(8)
    jax.block_until_ready(plan._U)
    w = time.perf_counter() - t0
    done = max(int(plan._lm.n_iter) - it0, 1)
    print(json.dumps({"workload": "ba_%dk" % (O // 1000),
                      "ms_per_step": round(w / done * 1e3, 3),
                      "pcg_iters_per_s": round(16 * done / w, 2)}))
"""


def run(mode, shuffle, size, affine):
    env = dict(os.environ)
    env["THALLO_AFFINE"] = affine
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", WORKER, mode, "1" if shuffle else "0",
         str(size)],
        capture_output=True, text=True, timeout=1500, env=env)
    line = (r.stdout.strip().splitlines() or ["{}"])[-1]
    try:
        out = json.loads(line)
    except json.JSONDecodeError:
        out = {"error": (r.stderr or r.stdout)[-300:]}
    out.update({"mode": mode, "shuffled_edges": shuffle,
                "THALLO_AFFINE": affine, "ts": time.time()})
    return out


def main():
    quick = "--quick" in sys.argv
    side = 128 if quick else 256
    pts = 16384 if quick else 62500
    cfgs = [
        ("arap", False, side, "1"),
        ("arap", False, side, "0"),
        ("arap", True, side, "1"),   # shuffled: detection can't apply
        ("ba", False, pts, "1"),
        ("ba", False, pts, "0"),
    ]
    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    out_path = os.path.join(REPO, "artifacts", "tpu_structured.jsonl")
    for cfg in cfgs:
        res = run(*cfg)
        print(json.dumps(res), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
