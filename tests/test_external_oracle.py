"""Framework-independent final-energy oracle.

The reference's de-facto correctness standard is matching Ceres' final
energy on identical data (SURVEY.md §4.5, CombinedSolverBase.h:102-155).
Ceres isn't available here; torch (CPU) plays its role: the same energy
is written BY HAND in torch (no thallo_tpu code in the oracle path) and
minimized with torch's L-BFGS.  Converged energies must agree."""
import numpy as np
import pytest

import thallo_tpu as tl

torch = pytest.importorskip("torch")


def test_laplacian_matches_torch_lbfgs():
    """tests/minimal's laplacian energy (reference tests/minimal/
    laplacian.t): 0.5*sum(w_fit*(X-A)^2 + w_reg*stencil diffs^2)."""
    n = 16
    w_fit, w_reg = 0.4, 1.0
    rng = np.random.RandomState(0)
    a = rng.rand(n, n).astype(np.float32)

    src = """
W, H = Dims("W", "H")
Inputs(X=Unknown(float, (W, H), 0), A=Array(float, (W, H), 1))
x, y = W(), H()
r = Residuals(
    fit=0.632455532 * (X(x, y) - A(x, y)),
    reg=[Select(InBounds(x + 1, y), X(x, y) - X(x + 1, y), 0),
         Select(InBounds(x, y + 1), X(x, y) - X(x, y + 1), 0)],
)
"""
    spec = tl.load_energy(src)
    plan = spec.plan({"W": n, "H": n}, solver="gauss_newton")
    plan.set_solver_parameter("nIterations", 30)
    plan.set_solver_parameter("lIterations", 60)
    plan.init({"X": a.copy(), "A": a})
    ours = plan.solve()

    # independent torch formulation (w_fit = 0.632455532^2 = 0.4)
    X = torch.tensor(a.copy(), requires_grad=True)
    A = torch.tensor(a)

    def energy():
        fit = w_fit * (X - A) ** 2
        dx = (X[:-1, :] - X[1:, :]) ** 2
        dy = (X[:, :-1] - X[:, 1:]) ** 2
        return 0.5 * (fit.sum() + w_reg * (dx.sum() + dy.sum()))

    opt = torch.optim.LBFGS([X], max_iter=300, tolerance_grad=1e-10,
                            tolerance_change=1e-14)

    def closure():
        opt.zero_grad()
        e = energy()
        e.backward()
        return e

    opt.step(closure)
    theirs = float(energy().detach())
    assert abs(ours - theirs) <= 1e-3 * max(abs(theirs), 1.0), (ours, theirs)


def test_graph_arap_matches_torch_lbfgs():
    """A graph energy (edge springs + anchors), independently in torch."""
    rng = np.random.RandomState(1)
    N, E = 40, 120
    v0 = rng.randint(0, N, size=E).astype(np.int32)
    v1 = ((v0 + 1 + rng.randint(0, N - 1, size=E)) % N).astype(np.int32)
    P0 = rng.rand(N, 2).astype(np.float32)
    targets = (P0 + 0.1 * rng.randn(N, 2)).astype(np.float32)

    src = """
N, E = Dims("N", "E")
Inputs(
    P=Unknown(float2, (N,), 0),
    T=Array(float2, (N,), 1),
    rest=Array(float2, (E,), 2),
    v0=Sparse((E,), (N,), 3),
    v1=Sparse((E,), (N,), 4),
)
n = N()
e = E()
r = Residuals(
    fit=0.5 * (P(n) - T(n)),
    spring=(P(v0(e)) - P(v1(e))) - rest(e),
)
"""
    rest = (P0[v0] - P0[v1]).astype(np.float32)
    spec = tl.load_energy(src)
    plan = spec.plan({"N": N, "E": E}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 40)
    plan.set_solver_parameter("lIterations", 60)
    plan.init({"P": P0.copy(), "T": targets, "rest": rest,
               "v0": v0, "v1": v1})
    ours = plan.solve()

    P = torch.tensor(P0.copy(), requires_grad=True)
    T = torch.tensor(targets)
    R = torch.tensor(rest)
    i0 = torch.tensor(v0.astype(np.int64))
    i1 = torch.tensor(v1.astype(np.int64))

    def energy():
        fit = (0.5 * (P - T)) ** 2
        spring = ((P[i0] - P[i1]) - R) ** 2
        return 0.5 * (fit.sum() + spring.sum())

    opt = torch.optim.LBFGS([P], max_iter=400, tolerance_grad=1e-10,
                            tolerance_change=1e-14)

    def closure():
        opt.zero_grad()
        e = energy()
        e.backward()
        return e

    opt.step(closure)
    theirs = float(energy().detach())
    assert abs(ours - theirs) <= 1e-3 * max(abs(theirs), 1.0), (ours, theirs)


def test_harness_writes_convergence_artifacts(tmp_path):
    """run_solvers emits finalCosts.json / perf.json / per-solver
    convergence CSVs (reference CombinedSolverBase.h:56-101,142-155)."""
    import json

    from thallo_tpu.utils.harness import run_solvers
    from thallo_tpu.models import image_warping as m

    res = run_solvers(
        m.make_spec, lambda: m.synthetic_inputs(16, 16), {"W": 16, "H": 16},
        solvers=["gauss_newton", "levenberg_marquardt"],
        nonlinear_iters=4, linear_iters=8, out_dir=str(tmp_path),
    )
    fc = json.loads((tmp_path / "finalCosts.json").read_text())
    assert set(fc) == {"gauss_newton", "levenberg_marquardt"}
    for solver in fc:
        assert fc[solver] < res[solver]["initial_cost"]
        csv = (tmp_path / f"{solver}_convergence.csv").read_text().splitlines()
        assert csv[0] == "iter,cost,time_s"
        assert len(csv) >= 4
        costs = [float(r.split(",")[1]) for r in csv[1:]]
        assert costs[-1] <= costs[0]
    assert "solve_time_s" in json.loads((tmp_path / "perf.json").read_text())["gauss_newton"]
