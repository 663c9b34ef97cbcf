"""ARAP mesh deformation example (port of /root/reference/examples/
arap_mesh_deformation): graph energy over mesh edges."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from thallo_tpu.models import arap_mesh_deformation as arap
from thallo_tpu.utils.harness import run_solvers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=24)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--liters", type=int, default=30)
    ap.add_argument("--out", default="results/arap_mesh_deformation")
    args = ap.parse_args()

    inputs = arap.synthetic_inputs(side=args.side)
    N = args.side * args.side
    E = len(inputs["V0"])
    results = run_solvers(
        arap.make_spec,
        lambda: arap.synthetic_inputs(side=args.side),
        {"N": N, "E": E},
        nonlinear_iters=args.iters,
        linear_iters=args.liters,
        out_dir=args.out,
    )
    for solver, r in results.items():
        print(f"{solver}: {r['initial_cost']:.4f} -> {r['final_cost']:.6f} "
              f"({r['solve_time_s']:.2f}s)")


if __name__ == "__main__":
    main()
