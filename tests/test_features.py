"""Ports of the reference's feature-coverage mini-apps
(/root/reference/tests/: minimal_graph, dense, minimal_fitting,
convolution, multidomain, exclude) as asserting tests against dense
jacfwd oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

import thallo_tpu as tl

from tests.util import dense_gn_solve, dense_jacobian


# ---------------------------------------------------------------------------
# minimal_graph (tests/minimal_graph/laplacian.t): sparse gathers
# ---------------------------------------------------------------------------
GRAPH = """
N, E = Dims("N", "E")
Inputs(
    X=Unknown(float, (N,), 0),
    A=Array(float, (N,), 1),
    v0=Sparse((E,), (N,), 2),
    v1=Sparse((E,), (N,), 3),
)
w_fit = 0.5
n, e = N(), E()
r = Residuals(
    fit=w_fit * (X(n) - A(n)),
    reg=X(v0(e)) - X(v1(e)),
)
"""


def test_graph_energy_matches_oracle():
    nN, nE = 24, 23
    spec = tl.load_energy(GRAPH)
    rng = np.random.RandomState(3)
    target = rng.rand(nN).astype(np.float32)
    v0 = np.arange(0, nE, dtype=np.int32)
    v1 = np.arange(1, nE + 1, dtype=np.int32)
    plan = spec.plan({"N": nN, "E": nE})
    plan.set_solver_parameter("nIterations", 12)
    plan.set_solver_parameter("lIterations", 50)
    plan.init({"X": target.copy(), "A": target, "v0": v0, "v1": v1})
    final = plan.solve()

    A = jnp.asarray(target)

    def res_fn(U):
        X = U["X"][..., 0]
        fit = 0.5 * (X - A)
        reg = X[v0] - X[v1]
        return jnp.concatenate([fit, reg])

    oracle, _ = dense_gn_solve(res_fn, {"X": jnp.asarray(target)[:, None]}, iters=12)
    assert final <= oracle * 1.05 + 1e-7


# ---------------------------------------------------------------------------
# minimal_fitting (tests/minimal_fitting/minimal_fitting.t):
# tensor contraction Sum({m}, S(n,m)*W(m)) with Jp materialize
# ---------------------------------------------------------------------------
FITTING = """
N, M = Dims("N", "M")
Inputs(
    W=Unknown(float, (M,), 0),
    S=Array(float, (N, M), 1),
    T=Array(float, (N,), 2),
)
n, m = N(), M()
result = Sum([m], S(n, m) * W(m))
r = Residuals(fit=T(n) - result)
r.fit.Jp.set_materialize(True)
"""


def test_contraction_matvec_fit():
    nN, nM = 20, 6
    rng = np.random.RandomState(5)
    S = rng.randn(nN, nM).astype(np.float32)
    w_true = rng.randn(nM).astype(np.float32)
    T = S @ w_true
    spec = tl.load_energy(FITTING)
    plan = spec.plan({"N": nN, "M": nM})
    plan.set_solver_parameter("nIterations", 5)
    plan.set_solver_parameter("lIterations", 40)
    plan.init({"W": np.zeros(nM, np.float32), "S": S, "T": T})
    final = plan.solve()
    # linear least-squares with exact solution w_true: cost -> 0
    assert final < 1e-6
    w = np.asarray(plan.get_unknown("W"))
    np.testing.assert_allclose(w, w_true, rtol=1e-2, atol=1e-2)


def test_contraction_jtf_matches_dense():
    nN, nM = 10, 4
    rng = np.random.RandomState(7)
    S = rng.randn(nN, nM).astype(np.float32)
    T = rng.randn(nN).astype(np.float32)
    w0 = rng.randn(nM).astype(np.float32)
    spec = tl.load_energy(FITTING)
    plan = spec.plan({"N": nN, "M": nM})
    plan.init({"W": w0, "S": S, "T": T})
    comp = plan.compiled
    U, ins = plan._U, plan._all_inputs()
    consts = comp.group_consts(ins)
    masks = comp.masks(ins, U)
    mjtf, diag, _ = comp.jtf_and_diag(U, ins, consts, masks, {})

    def res_fn(Ue):
        return T - S @ Ue["W"][..., 0]

    r, J, _, _ = dense_jacobian(res_fn, U)
    np.testing.assert_allclose(
        np.asarray(mjtf["W"]).ravel(), np.asarray(-(J.T @ r)), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(diag["W"]).ravel(), np.asarray(jnp.sum(J * J, axis=0)), rtol=1e-4, atol=1e-5
    )


# ---------------------------------------------------------------------------
# convolution (tests/convolution/convolution.t): shifted-index contraction
# with InBoundsExpanded
# ---------------------------------------------------------------------------
CONV = """
N, K = Dims("N", "K")
Inputs(
    C=Unknown(float, (K,), 0),
    R=Array(float, (N,), 1),
    T=Array(float, (N,), 2),
)
n, k = N(), K()
result = Sum([k], R(n - k + 2) * C(k))
e_fit = T(n) - result
e_fit = Select(InBoundsExpanded(n, 2), e_fit, 0.0)
r = Residuals(conv=e_fit)
r.conv.Jp.set_materialize(True)
"""


def test_convolution_recovers_kernel():
    nN, nK = 64, 5
    rng = np.random.RandomState(11)
    R = rng.randn(nN).astype(np.float32)
    c_true = np.array([0.1, 0.2, 0.4, 0.2, 0.1], np.float32)
    # wrap-access convolution: T(n) = sum_k R((n-k+2) mod N) * C(k)
    T = np.zeros(nN, np.float32)
    for k in range(nK):
        T += np.roll(R, k - 2) * c_true[k]
    spec = tl.load_energy(CONV)
    plan = spec.plan({"N": nN, "K": nK})
    plan.set_solver_parameter("nIterations", 5)
    plan.set_solver_parameter("lIterations", 60)
    plan.init({"C": np.zeros(nK, np.float32), "R": R, "T": T})
    final = plan.solve()
    assert final < 1e-4
    c = np.asarray(plan.get_unknown("C"))
    np.testing.assert_allclose(c, c_true, atol=5e-2)


# ---------------------------------------------------------------------------
# multidomain (tests/multidomain/multidomain.t): cross-product residual
# over two unknown index spaces
# ---------------------------------------------------------------------------
MULTIDOMAIN = """
N, U = Dims("N", "U")
Inputs(
    offset=Unknown(float, (U,), 0),
    pts=Unknown(float, (N,), 1),
    target=Array(float, (N,), 2),
)
n, u = N(), U()
x, x_0 = pts(n), target(n)
r = Residuals(
    fit=offset(u) + x - x_0,
    reg=x,
)
"""


def test_multidomain_cross_product():
    nN, nU = 12, 3
    rng = np.random.RandomState(13)
    target = rng.randn(nN).astype(np.float32)
    spec = tl.load_energy(MULTIDOMAIN)
    plan = spec.plan({"N": nN, "U": nU})
    plan.set_solver_parameter("nIterations", 8)
    plan.set_solver_parameter("lIterations", 50)
    plan.init({
        "offset": np.zeros(nU, np.float32),
        "pts": np.zeros(nN, np.float32),
        "target": target,
    })
    final = plan.solve()

    def res_fn(Ue):
        off = Ue["offset"][..., 0]
        pts = Ue["pts"][..., 0]
        fit = (off[None, :] + pts[:, None] - jnp.asarray(target)[:, None]).reshape(-1)
        return jnp.concatenate([fit, pts])

    oracle, _ = dense_gn_solve(
        res_fn,
        {"offset": jnp.zeros((nU, 1)), "pts": jnp.zeros((nN, 1))},
        iters=8,
    )
    assert final <= oracle * 1.05 + 1e-7


# ---------------------------------------------------------------------------
# exclusion (reference Image:Exclude, image_warping.t:16-17)
# ---------------------------------------------------------------------------
EXCLUDE = """
W, H = Dims("W", "H")
Inputs(
    X=Unknown(float, (W, H), 0),
    A=Array(float, (W, H), 1),
    M=Array(float, (W, H), 2),
)
x, y = W(), H()
X.Exclude(Not(eq(M(x, y), 0)))
r = Residuals(
    fit=0.5 * (X(x, y) - A(x, y)),
    reg=Select(InBounds(x + 1, y), X(x, y) - X(x + 1, y), 0),
)
"""


def test_exclude_freezes_unknowns():
    n = 10
    rng = np.random.RandomState(17)
    A = rng.rand(n, n).astype(np.float32)
    M = np.zeros((n, n), np.float32)
    M[: n // 2] = 1.0  # top half excluded
    X0 = np.full((n, n), 0.25, np.float32)
    spec = tl.load_energy(EXCLUDE)
    plan = spec.plan({"W": n, "H": n})
    plan.set_solver_parameter("nIterations", 5)
    plan.init({"X": X0.copy(), "A": A, "M": M})
    plan.solve()
    X = np.asarray(plan.get_unknown("X"))
    # excluded region untouched, active region moved
    np.testing.assert_array_equal(X[: n // 2], X0[: n // 2])
    assert np.abs(X[n // 2:] - X0[n // 2:]).max() > 1e-3


# ---------------------------------------------------------------------------
# dense curve fitting (tests/dense/curveFitting.t): nonlinear residual
# through two sparse maps
# ---------------------------------------------------------------------------
CURVE = """
N, U, E = Dims("N", "U", "E")
Inputs(
    funcParams=Unknown(float2, (U,), 0),
    data=Array(float2, (N,), 1),
    D=Sparse((E,), (N,), 2),
    P=Sparse((E,), (U,), 3),
)
UsePreconditioner(True)
e = E()
x, y = data(D(e))(0), data(D(e))(1)
a, b = funcParams(P(e))(0), funcParams(P(e))(1)
r = Residuals(fit=y - (a * cos(b * x) + b * sin(a * x)))
"""


@pytest.mark.parametrize("solver", ["gauss_newton", "levenberg_marquardt"])
def test_dense_curve_fitting(solver):
    nE = 40
    a_true, b_true = 1.3, 0.8
    rng = np.random.RandomState(19)
    xs = np.linspace(0, 6, nE).astype(np.float32)
    ys = a_true * np.cos(b_true * xs) + b_true * np.sin(a_true * xs)
    data = np.stack([xs, ys], axis=-1)
    spec = tl.load_energy(CURVE)
    plan = spec.plan({"N": nE, "U": 1, "E": nE}, solver=solver)
    plan.set_solver_parameter("nIterations", 30)
    plan.set_solver_parameter("lIterations", 20)
    plan.init({
        "funcParams": np.array([[0.9, 0.6]], np.float32),
        "data": data,
        "D": np.arange(nE, dtype=np.int32),
        "P": np.zeros(nE, np.int32),
    })
    final = plan.solve()
    ab = np.asarray(plan.get_unknown("funcParams", squeeze=False))[0]
    assert final < 1e-6
    np.testing.assert_allclose(ab, [a_true, b_true], atol=1e-3)


# ---------------------------------------------------------------------------
# dense_sparse (tests/dense_sparse/curveFitting_combined.t — broken
# upstream with a Reesiduals typo; this is the repaired energy): the same
# nonlinear fit expressed BOTH densely (over N) and through sparse maps
# (over E), as two residual groups in one problem
# ---------------------------------------------------------------------------
DENSE_SPARSE = """
N, U, E = Dims("N", "U", "E")
Inputs(
    funcParams=Unknown(float2, (U,), 0),
    data=Array(float2, (N,), 1),
    D=Sparse((E,), (N,), 2),
    P=Sparse((E,), (U,), 3),
)
UsePreconditioner(True)
e, n, u = E(), N(), U()
yd = data(n)(1)
bd = funcParams(u)(1)
ad_ = funcParams(u)(0)
xd = data(n)(0)
ys = data(D(e))(1)
bs = funcParams(P(e))(1)
as_ = funcParams(P(e))(0)
xs = data(D(e))(0)
r = Residuals(
    dense=yd - (ad_ * cos(bd * xd) + bd * sin(ad_ * xd)),
    sparse=ys - (as_ * cos(bs * xs) + bs * sin(as_ * xs)),
)
"""


def test_dense_sparse_combined():
    nE = 30
    a_true, b_true = 1.1, 0.7
    xs = np.linspace(0, 5, nE).astype(np.float32)
    ys = a_true * np.cos(b_true * xs) + b_true * np.sin(a_true * xs)
    data = np.stack([xs, ys], axis=-1)
    spec = tl.load_energy(DENSE_SPARSE)
    plan = spec.plan({"N": nE, "U": 1, "E": nE}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 30)
    plan.set_solver_parameter("lIterations", 20)
    plan.init({
        "funcParams": np.array([[0.8, 0.5]], np.float32),
        "data": data,
        "D": np.arange(nE, dtype=np.int32),
        "P": np.zeros(nE, np.int32),
    })
    final = plan.solve()
    ab = np.asarray(plan.get_unknown("funcParams", squeeze=False))[0]
    # both groups fit the same curve; doubled information, same optimum
    assert final < 1e-5
    np.testing.assert_allclose(ab, [a_true, b_true], atol=1e-3)
    assert len(plan.compiled.groups) == 2  # dense (N,U) + sparse (E) domains


def test_sparse_index_bounds_validated():
    """Out-of-range sparse indices must fail loudly at init: device
    gathers use promise_in_bounds and would silently clamp (the
    reference's validateParameters guard, util.t:645-674)."""
    src = """
N, E = Dims("N", "E")
Inputs(
    X=Unknown(float, (N,), 0),
    v0=Sparse((E,), (N,), 1),
)
e = E()
r = Residuals(edge=X(v0(e)) - 1.0)
"""
    spec = tl.load_energy(src)
    plan = spec.plan({"N": 8, "E": 4})
    bad = np.array([0, 3, 8, 1], np.int32)  # 8 is out of range for N=8
    with pytest.raises(ValueError, match="v0.*\\[0, 8\\)"):
        plan.init({"X": np.ones(8, np.float32), "v0": bad})
    with pytest.raises(ValueError, match="v0"):
        plan.init({"X": np.ones(8, np.float32),
                   "v0": np.array([0, -1, 2, 3], np.int32)})
    # valid indices still bind
    plan.init({"X": np.ones(8, np.float32),
               "v0": np.array([0, 1, 2, 3], np.int32)})


def test_sparse_index_bounds_per_out_dim():
    """Multi-out-dim sparse maps store one index column per out dim; a
    column exceeding ITS OWN dim (but below the flat product) must be
    rejected (review finding: the flat check let it wrap silently)."""
    src = """
W, A, B = Dims("W", "A", "B")
Inputs(
    X=Unknown(float, (A, B), 0),
    m=Sparse((W,), (A, B), 1),
)
w = W()
r = Residuals(pick=X(m(w)) - 1.0)
"""
    spec = tl.load_energy(src)
    plan = spec.plan({"W": 3, "A": 4, "B": 100})
    ok = np.array([[0, 5], [3, 99], [2, 0]], np.int32)
    bad = np.array([[0, 5], [7, 99], [2, 0]], np.int32)  # 7 >= A=4, but 7 < 400
    with pytest.raises(ValueError, match="m.*A.*\\[0, 4\\)"):
        plan.init({"X": np.ones((4, 100), np.float32), "m": bad})
    plan.init({"X": np.ones((4, 100), np.float32), "m": ok})
