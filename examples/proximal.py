"""Proximal example (port of /root/reference/examples/proximal — whose
driver is byte-identical to the deconvolution one: same energy, same
K/M/b_1..b_3/lambda inputs, re-solved from an x0 iterate).  This driver
makes the proximal structure explicit: an outer proximal loop solves

    X_{k+1} = argmin_X  E_deconv(X) + rho/2 ||X - X_k||^2

by adding the proximal quadratic as a fourth residual term
(sqrt(rho/2) * (X - X0)) and re-binding X0 = previous iterate between
outer rounds through ProblemInit/Step re-entrancy — the same
between-solve parameter rebinding the reference's doubly-nested solvers
use (Thallo.h:69-76, bundle_fusion)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402

from thallo_tpu.lib_env import load_energy  # noqa: E402
from thallo_tpu.models import deconvolution as dc  # noqa: E402

PROX_ENERGY = dc.ENERGY_TMPL.replace(
    "    K=Array(float, (Kd, Kd), 7),\n)",
    """    K=Array(float, (Kd, Kd), 7),
    sqrt_rho=Param(float, 8),
    X0=Array(float, (W, H), 9),
)""",
).replace(
    "r = Residuals(conv=E_conv, dx=E_dx, dy=E_dy)",
    "E_prox = sqrt_rho * (X(x, y) - X0(x, y))\n"
    "r = Residuals(conv=E_conv, dx=E_dx, dy=E_dy, prox=E_prox)",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--k-half", type=int, default=7)
    ap.add_argument("--rho", type=float, default=1.0)
    ap.add_argument("--outer", type=int, default=5,
                    help="proximal outer iterations")
    ap.add_argument("--iters", type=int, default=3,
                    help="nonlinear iterations per subproblem")
    ap.add_argument("--liters", type=int, default=25)
    ap.add_argument("--out", default="results/proximal")
    args = ap.parse_args()

    W = H = args.size
    inputs, X_true = dc.synthetic_inputs(W=W, H=H, k_half=args.k_half)
    inputs = dict(inputs)
    inputs["sqrt_rho"] = np.float32(np.sqrt(args.rho / 2.0))
    inputs["X0"] = inputs["X"].copy()

    spec = load_energy(PROX_ENERGY.format(k_half=args.k_half),
                       filename="proximal.py")
    plan = spec.plan({"W": W, "H": H, "Kd": 2 * args.k_half + 1},
                     solver="gauss_newton")
    plan.set_solver_parameter("nIterations", args.iters)
    plan.set_solver_parameter("lIterations", args.liters)

    costs = []
    for k in range(args.outer):
        c0 = plan.init(inputs)  # rebinds X0 to the previous iterate
        final = plan.solve()
        X = np.asarray(plan.get_unknown("X"))
        inputs["X"] = X.copy()
        inputs["X0"] = X.copy()
        costs.append((c0, final))
        print(f"prox iter {k}: {c0:.5g} -> {final:.5g}  "
              f"rmse {np.sqrt(((X - X_true) ** 2).mean()):.4f}")
    os.makedirs(args.out, exist_ok=True)
    import json

    with open(os.path.join(args.out, "finalCosts.json"), "w") as f:
        json.dump({"proximal_gauss_newton": float(costs[-1][1])}, f,
                  indent=2)
    # monotone proximal descent: each subproblem must not increase the
    # regularized objective it starts from
    assert all(c1 <= c0 * (1 + 1e-5) for c0, c1 in costs)
    print(f"wrote {args.out}/finalCosts.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
