"""ComputedArray materialize-vs-inline (the reference's second scheduling
axis: select_expressions_to_materialize, thallo.t:5192-5231; precompute
kernels thallo.t:4046-4094).  Materialization must never change answers,
only execution."""
import numpy as np

import thallo_tpu as tl

# a shared shading-style subexpression accessed at several offsets
ENERGY_TMPL = """
W, H = Dims("W", "H")
Inputs(
    X=Unknown(float, (W, H), 0),
    A=Array(float, (W, H), 1),
)
x, y = W(), H()
shade = ComputedArray("shade", [x, y], X(x, y) * X(x, y) + 0.5 * A(x, y))
{mat}
r = Residuals(
    fit=0.5 * (X(x, y) - A(x, y)),
    shading=Select(InBounds(x + 1, y), shade(x, y) - shade(x + 1, y), 0),
)
"""


def _solve(mat: bool, n=12, solver="levenberg_marquardt"):
    src = ENERGY_TMPL.format(mat='shade.set_materialize(True)' if mat else '')
    spec = tl.load_energy(src)
    rng = np.random.RandomState(0)
    t = rng.rand(n, n).astype(np.float32)
    plan = spec.plan({"W": n, "H": n}, solver=solver)
    plan.set_solver_parameter("nIterations", 8)
    plan.set_solver_parameter("lIterations", 25)
    plan.init({"X": t.copy(), "A": t})
    return plan, plan.solve()


def test_materialized_ca_matches_inline():
    plan_i, f_inline = _solve(False)
    plan_m, f_mat = _solve(True)
    # materialized group exists and carries an inline twin for jacobians
    gp = plan_m.compiled.groups[-1]
    assert any(g.group.has_materialized for g in plan_m.compiled.groups)
    assert np.isclose(f_inline, f_mat, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(plan_i.get_unknown("X")), np.asarray(plan_m.get_unknown("X")),
        rtol=1e-3, atol=1e-4,
    )


def test_get_materialize_roundtrip():
    """exp.get() with the produced computed image materialized."""
    src = """
W, H = Dims("W", "H")
Inputs(X=Unknown(float, (W, H), 0), A=Array(float, (W, H), 1))
x, y = W(), H()
expensive = sin(X(x, y)) * cos(A(x, y)) + X(x, y)
g = expensive.get(x, y)
r = Residuals(
    fit=X(x, y) - A(x, y),
    reg=Select(InBounds(x + 1, y), g - expensive.get(x + 1, y), 0),
)
"""
    spec = tl.load_energy(src)
    rng = np.random.RandomState(1)
    t = rng.rand(10, 10).astype(np.float32)
    plan = spec.plan({"W": 10, "H": 10})
    plan.set_solver_parameter("nIterations", 5)
    c0 = plan.init({"X": (t * 0.5).copy(), "A": t})
    assert plan.solve() < c0
