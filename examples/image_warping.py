"""Image warping example (port of /root/reference/examples/image_warping):
ARAP 2-D mesh warp driven by point constraints, solved with GN and LM,
emitting finalCosts.json / perf.json like the reference's combined-solver
driver."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from thallo_tpu.models import image_warping
from thallo_tpu.utils.harness import run_solvers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--liters", type=int, default=20)
    ap.add_argument("--out", default="results/image_warping")
    args = ap.parse_args()

    results = run_solvers(
        image_warping.make_spec,
        lambda: image_warping.synthetic_inputs(args.size, args.size),
        {"W": args.size, "H": args.size},
        nonlinear_iters=args.iters,
        linear_iters=args.liters,
        out_dir=args.out,
    )
    for solver, r in results.items():
        print(f"{solver}: {r['initial_cost']:.4f} -> {r['final_cost']:.6f} "
              f"({r['solve_time_s']:.2f}s)")


if __name__ == "__main__":
    main()
