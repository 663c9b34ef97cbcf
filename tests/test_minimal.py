"""Port of the reference `tests/minimal` mini-app (2-D stencil laplacian,
/root/reference/tests/minimal/laplacian.t + main.cpp) with real asserts:
the reference only prints the final cost; here we check J^T F, diag(J^T J)
and the solved cost against a dense jacfwd oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

import thallo_tpu as tl

from tests.util import dense_gn_solve, dense_jacobian, flatten_tree

LAPLACIAN = """
W, H = Dims("W", "H")
Inputs(
    X=Unknown(float, (W, H), 0),
    A=Array(float, (W, H), 1),
)
w_fit = 0.2
x, y = W(), H()
r = Residuals(
    fit=w_fit * (X(x, y) - A(x, y)),
    reg=[
        Select(InBounds(x + 1, y + 1), X(x, y) - X(x + 1, y), 0),
        Select(InBounds(x, y + 1), X(x, y) - X(x, y + 1), 0),
    ],
)
"""


def make_problem(n=16, seed=0):
    spec = tl.load_energy(LAPLACIAN)
    rng = np.random.RandomState(seed)
    target = rng.rand(n, n).astype(np.float32)
    inputs = {"X": target.copy(), "A": target}
    return spec, inputs


def reference_residuals(U, A, w_fit=0.2):
    """Independent (non-DSL) evaluation of the same energy."""
    X = U["X"][..., 0]
    n = X.shape[0]
    fit = w_fit * (X - A)
    # reg: wrap-access with in-bounds guard (reference torus wrap + Select)
    reg1 = X - jnp.roll(X, -1, axis=0)
    mask1 = jnp.zeros_like(X).at[: n - 1, : n - 1].set(1.0)
    reg2 = X - jnp.roll(X, -1, axis=1)
    mask2 = jnp.zeros_like(X).at[:, : n - 1].set(1.0)
    return jnp.concatenate(
        [fit.reshape(-1), (reg1 * mask1).reshape(-1), (reg2 * mask2).reshape(-1)]
    )


def test_cost_matches_oracle():
    spec, inputs = make_problem()
    plan = spec.plan({"W": 16, "H": 16}, solver="gauss_newton")
    c0 = plan.init(inputs)
    U = {"X": jnp.asarray(inputs["X"])[..., None]}
    r = reference_residuals(U, jnp.asarray(inputs["A"]))
    assert np.isclose(c0, 0.5 * float(r @ r), rtol=1e-5)


def test_jtf_and_diag_match_dense():
    spec, inputs = make_problem(n=8)
    plan = spec.plan({"W": 8, "H": 8}, solver="gauss_newton")
    plan.init(inputs)
    comp = plan.compiled
    U = plan._U
    ins = plan._all_inputs()
    consts = comp.group_consts(ins)
    masks = comp.masks(ins, U)
    mjtf, diag, _ = comp.jtf_and_diag(U, ins, consts, masks, {})

    A = jnp.asarray(inputs["A"])
    r, J, flat, unflatten = dense_jacobian(
        lambda X: reference_residuals(X, A), U
    )
    jtf_dense = -(J.T @ r)
    diag_dense = jnp.sum(J * J, axis=0)
    np.testing.assert_allclose(
        np.asarray(mjtf["X"]).reshape(-1), np.asarray(jtf_dense), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(diag["X"]).reshape(-1), np.asarray(diag_dense), rtol=1e-4, atol=1e-5
    )


def test_jtjp_matches_dense():
    spec, inputs = make_problem(n=8)
    plan = spec.plan({"W": 8, "H": 8}, solver="gauss_newton")
    plan.init(inputs)
    comp = plan.compiled
    U = plan._U
    ins = plan._all_inputs()
    consts = comp.group_consts(ins)
    masks = comp.masks(ins, U)
    _, _, jac_store = comp.jtf_and_diag(U, ins, consts, masks, {})
    apply_jtjp = comp.make_jtjp(U, ins, consts, masks, jac_store)

    rng = np.random.RandomState(1)
    p = {"X": jnp.asarray(rng.randn(8, 8, 1).astype(np.float32))}
    Ap = apply_jtjp(p)

    A = jnp.asarray(inputs["A"])
    _, J, flat, unflatten = dense_jacobian(lambda X: reference_residuals(X, A), U)
    pflat, _ = flatten_tree(p)
    Ap_dense = J.T @ (J @ pflat)
    np.testing.assert_allclose(
        np.asarray(Ap["X"]).reshape(-1), np.asarray(Ap_dense), rtol=1e-3, atol=1e-4
    )


@pytest.mark.parametrize("solver", ["gauss_newton", "levenberg_marquardt"])
def test_solve_converges_to_oracle(solver):
    spec, inputs = make_problem(n=16)
    plan = spec.plan({"W": 16, "H": 16}, solver=solver)
    plan.set_solver_parameter("nIterations", 10)
    plan.set_solver_parameter("lIterations", 30)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert final < c0
    A = jnp.asarray(inputs["A"])
    oracle_cost, _ = dense_gn_solve(
        lambda X: reference_residuals(X, A),
        {"X": jnp.asarray(inputs["X"])[..., None]},
        iters=10,
    )
    # linear least squares: GN with exact solve converges in 1 step
    assert final <= oracle_cost * 1.05 + 1e-6


def test_materialized_schedules_match():
    """The reference minimal test sets J and JtJ materialize
    (laplacian.t:16-20); all schedules must give the same answer."""
    results = {}
    for sched in ["none", "J", "JtJ"]:
        spec, inputs = make_problem(n=12)
        if sched != "none":
            for nr in spec.energy:
                getattr(nr, sched).set_materialize(True)
        plan = spec.plan({"W": 12, "H": 12}, solver="gauss_newton")
        plan.set_solver_parameter("nIterations", 5)
        plan.init(inputs)
        results[sched] = plan.solve()
    assert np.isclose(results["none"], results["J"], rtol=1e-4)
    assert np.isclose(results["none"], results["JtJ"], rtol=1e-4)
