"""Generic model runner: solve any registered model family on synthetic
data (the breadth analog of the reference's 20 example apps; specific
drivers with richer options live next to this file)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from thallo_tpu import models  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=sorted(models.REGISTRY.keys()))
    ap.add_argument("--solver", default="levenberg_marquardt",
                    choices=["gauss_newton", "levenberg_marquardt"])
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--liters", type=int, default=20)
    ap.add_argument("--verbosity", type=int, default=1)
    args = ap.parse_args()

    mod = models.get(args.model)
    spec = mod.make_spec()
    made = mod.synthetic_inputs()
    inputs, meta = made if isinstance(made, tuple) else (made, {})

    # infer dim sizes from the inputs (dims appear in image/sparse shapes)
    sizes = {}
    for im in list(spec.unknowns) + list(spec.arrays):
        arr = inputs[im.name]
        for d, s in zip(im.dims, arr.shape):
            sizes.setdefault(d.name, int(s))
    for sm in spec.sparse_maps:
        arr = inputs[sm.name]
        for d, s in zip(sm.in_dims, arr.shape):
            sizes.setdefault(d.name, int(s))
    missing = [d.name for d in spec.dims if d.name not in sizes]
    if missing:
        raise SystemExit(f"cannot infer sizes for dims {missing}")

    plan = spec.plan(sizes, solver=args.solver, verbosity=args.verbosity)
    plan.set_solver_parameter("nIterations", args.iters)
    plan.set_solver_parameter("lIterations", args.liters)
    c0 = plan.init(inputs)
    final = plan.solve()
    print(f"{args.model} [{args.solver}] dims={sizes}: {c0:.6g} -> {final:.6g}")
    print(plan.get_performance_summary().markdown())


if __name__ == "__main__":
    main()
