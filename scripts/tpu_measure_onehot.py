"""Measure THALLO_ONEHOT_COLS (one-hot MXU gather for small-source BSR
columns, solver/blocksparse.py) on the real chip: BA with 256 cameras is
the intended beneficiary — the camera column gather in bsr_apply reads a
256-row source 250k+ times per PCG iteration.

Appends one JSON line per config to artifacts/tpu_onehot.jsonl.
Usage: python scripts/tpu_measure_onehot.py [--quick]
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
import jax

n_pts = int(sys.argv[1])
from thallo_tpu.models import bundle_adjustment as ba
inputs, _ = ba.synthetic_inputs(n_cameras=256, n_points=n_pts,
                                obs_per_point=4)
O = len(inputs["oToC"])
spec = ba.make_spec()
plan = spec.plan({"C": 256, "P": n_pts, "O": O},
                 solver="levenberg_marquardt")
plan.set_solver_parameter("nIterations", 10_000)
plan.set_solver_parameter("q_tolerance", 0.0)
plan.set_solver_parameter("function_tolerance", 0.0)
plan.init(inputs)
plan.steps_per_dispatch = 4
out = {"workload": "ba_%dk" % (O // 1000)}
for li in (4, 36):
    plan.set_solver_parameter("lIterations", li)
    plan.run_steps(8); jax.block_until_ready(plan._U)
    it0 = int(plan._lm.n_iter)
    t0 = time.perf_counter(); plan.run_steps(8)
    jax.block_until_ready(plan._U)
    w = time.perf_counter() - t0
    done = max(int(plan._lm.n_iter) - it0, 1)
    out["ms_per_step_l%d" % li] = round(w / done * 1e3, 3)
    out["steps_l%d" % li] = done
m = (out["ms_per_step_l36"] - out["ms_per_step_l4"]) / 32
out["marginal_pcg_iter_ms"] = round(m, 4)
print(json.dumps(out))
"""


def run(n_pts, onehot):
    env = dict(os.environ)
    env["THALLO_ONEHOT_COLS"] = onehot
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-c", WORKER, str(n_pts)],
                       capture_output=True, text=True, timeout=1500,
                       env=env)
    line = (r.stdout.strip().splitlines() or ["{}"])[-1]
    try:
        out = json.loads(line)
    except json.JSONDecodeError:
        out = {"error": (r.stderr or r.stdout)[-300:]}
    out.update({"THALLO_ONEHOT_COLS": onehot, "ts": time.time()})
    return out


def main():
    pts = 16384 if "--quick" in sys.argv else 62500
    out_path = os.path.join(REPO, "artifacts", "tpu_onehot.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    for onehot in ("0", "256"):
        res = run(pts, onehot)
        print(json.dumps(res), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
