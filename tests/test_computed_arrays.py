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


def test_ca_gradient_arrays_match_oracle():
    """Materialized-CA groups now differentiate through CA gradient
    arrays + composed accesses (lower.py jac_slots; reference gradient
    images thallo.t:1777-1822) instead of a force-inlined twin.  Pin
    J^T F / diag / JTJp against the dense jacfwd oracle."""
    import jax
    import jax.numpy as jnp

    from tests.util import dense_jacobian, flatten_tree

    src = ENERGY_TMPL.format(mat='shade.set_materialize(True)')
    spec = tl.load_energy(src)
    rng = np.random.RandomState(3)
    n = 8
    t = rng.rand(n, n).astype(np.float32)
    plan = spec.plan({"W": n, "H": n})
    plan.init({"X": rng.rand(n, n).astype(np.float32), "A": t})
    comp = plan.compiled
    gp = next(g for g in comp.groups if g.group.has_materialized)
    # the twin is gone; composed slots carry the CA chain rule
    assert gp.inline_group is None
    assert gp.group.ca_jac_ok
    assert len(gp.group.jac_slots) > len(gp.group.uslots)

    U = plan._U
    ins = plan._all_inputs()
    consts = comp.group_consts(ins)
    masks = comp.masks(ins, U)
    mjtf, diag, jac_store = comp.jtf_and_diag(U, ins, consts, masks, {})

    def res_fn(X):
        # oracle: the plain residuals() path differentiates through
        # ca_values by jvp (independent of the gradient-array path)
        return jnp.concatenate([
            g.group.residuals(X, ins, c).reshape(-1)
            for g, c in zip(comp.groups, consts)
        ])

    r, J, flat, unflatten = dense_jacobian(res_fn, U)
    jtf_dense = -(J.T @ r)
    np.testing.assert_allclose(
        np.asarray(mjtf["X"]).reshape(-1), np.asarray(jtf_dense),
        rtol=1e-3, atol=1e-4,
    )
    # JTJp through the jac-slot path
    apply_jtjp = comp.make_jtjp(U, ins, consts, masks, jac_store)
    p = {"X": jnp.asarray(rng.randn(n, n, 1).astype(np.float32))}
    Ap = apply_jtjp(p)
    pflat, _ = flatten_tree(p)
    Ap_dense = J.T @ (J @ pflat)
    np.testing.assert_allclose(
        np.asarray(Ap["X"]).reshape(-1), np.asarray(Ap_dense),
        rtol=1e-3, atol=1e-4,
    )


def test_ca_gradient_arrays_graph_access():
    """CA over nodes accessed through a sparse edge map: the composed
    slot composes the CA's stencil access with the graph indirection
    (SparseComp substitution) — the case the inline twin recomputed."""
    import jax.numpy as jnp

    from tests.util import dense_jacobian

    src = """
N, E = Dims("N", "E")
Inputs(
    X=Unknown(float2, (N,), 0),
    A=Array(float2, (N,), 1),
    v0=Sparse((E,), (N,), 2),
    v1=Sparse((E,), (N,), 3),
)
n = N()
e = E()
feat = ComputedArray("feat", [n], X(n) * X(n) + A(n))
feat.set_materialize(True)
r = Residuals(
    fit=X(n) - A(n),
    edge=feat(v0(e)) - feat(v1(e)),
)
"""
    spec = tl.load_energy(src)
    rng = np.random.RandomState(5)
    Nn, Ee = 12, 30
    a = rng.rand(Nn, 2).astype(np.float32)
    v0 = rng.randint(0, Nn, size=Ee).astype(np.int32)
    v1 = ((v0 + 1 + rng.randint(0, Nn - 1, size=Ee)) % Nn).astype(np.int32)
    plan = spec.plan({"N": Nn, "E": Ee})
    plan.init({"X": rng.rand(Nn, 2).astype(np.float32), "A": a,
               "v0": v0, "v1": v1})
    comp = plan.compiled
    gp = next(g for g in comp.groups if g.group.has_materialized)
    assert gp.inline_group is None and gp.group.ca_jac_ok

    U = plan._U
    ins = plan._all_inputs()
    consts = comp.group_consts(ins)
    masks = comp.masks(ins, U)
    mjtf, diag, _ = comp.jtf_and_diag(U, ins, consts, masks, {})

    def res_fn(X):
        return jnp.concatenate([
            g.group.residuals(X, ins, c).reshape(-1)
            for g, c in zip(comp.groups, consts)
        ])

    r, J, flat, unflatten = dense_jacobian(res_fn, U)
    jtf_dense = unflatten(-(J.T @ r))
    np.testing.assert_allclose(
        np.asarray(mjtf["X"]), np.asarray(jtf_dense["X"]),
        rtol=1e-3, atol=1e-4,
    )
    # and the full solve decreases cost with a sane final state
    plan.set_solver_parameter("nIterations", 6)
    c0 = plan.init({"X": rng.rand(Nn, 2).astype(np.float32), "A": a,
                    "v0": v0, "v1": v1})
    assert plan.solve() < c0


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
