"""ARAP mesh deformation example (port of /root/reference/examples/
arap_mesh_deformation): graph energy over mesh edges.  With --ply it
runs on a real mesh file (the reference loads meshes through OpenMesh
and builds one graph entry per half-edge) and writes the deformed mesh
next to the results."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402

from thallo_tpu.models import arap_mesh_deformation as arap  # noqa: E402
from thallo_tpu.utils.harness import run_solvers  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=24,
                    help="synthetic grid mesh side (ignored with --ply)")
    ap.add_argument("--ply", default=None, help="input mesh (.ply)")
    ap.add_argument("--out-ply", default=None,
                    help="write the deformed mesh here (with --ply)")
    ap.add_argument("--pull", type=float, nargs=3, default=[1.0, 1.0, 2.0],
                    help="constraint displacement applied to the last vertex")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--liters", type=int, default=30)
    ap.add_argument("--out", default="results/arap_mesh_deformation")
    args = ap.parse_args()

    if args.ply:
        from thallo_tpu.io import load_ply, mesh_to_arap_inputs, save_ply

        verts, faces, _ = load_ply(args.ply)
        if faces is None:
            raise SystemExit("mesh has no faces; cannot build the edge graph")
        # anchor the first vertex, pull the last (the reference example
        # takes constraint sets from per-app handles)
        cons = {0: verts[0], len(verts) - 1: verts[-1] + np.asarray(args.pull,
                                                                   np.float32)}
        inputs, sizes = mesh_to_arap_inputs(verts, faces, constraints=cons)
        make_inputs = lambda: inputs  # noqa: E731
    else:
        sizes = {"N": args.side * args.side,
                 "E": len(arap.synthetic_inputs(side=args.side)["V0"])}
        make_inputs = lambda: arap.synthetic_inputs(side=args.side)  # noqa: E731

    results = run_solvers(
        arap.make_spec,
        make_inputs,
        sizes,
        nonlinear_iters=args.iters,
        linear_iters=args.liters,
        out_dir=args.out,
    )
    for solver, r in results.items():
        print(f"{solver}: {r['initial_cost']:.4f} -> {r['final_cost']:.6f} "
              f"({r['solve_time_s']:.2f}s)")

    if args.ply and args.out_ply:
        from thallo_tpu.io import save_ply

        best = results.get("gauss_newton") or next(iter(results.values()))
        pos = np.asarray(best["plan"].get_unknown("Position"))
        save_ply(args.out_ply, pos, faces)
        print(f"deformed mesh -> {args.out_ply}")


if __name__ == "__main__":
    main()
