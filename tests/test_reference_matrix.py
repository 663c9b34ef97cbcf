"""Ports of the remaining reference test-matrix entries (SURVEY.md §4.1)
not already covered by name elsewhere: minimal_2d_graph (sparse maps
with 2-D in-spaces mixed with direct domains in one access),
complicated_graph_energy (nonlinear channel-mixing edge energy), and
expansive_sparse_materialize (wide implicit computed array accessed
through sparse maps with materialize hints).  The reference prints
final costs for manual comparison; these assert against dense-jacfwd
oracles / strict cost decrease."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import thallo_tpu as tl

from tests.util import dense_jacobian, flatten_tree


def test_minimal_2d_graph():
    """reference tests/minimal_2d_graph/laplacian.t: per-pixel neighbor
    maps Xn:(W,H)->(W), Yn:(W,H)->(H), accessed as X(Xn(x,y), y) — a
    sparse component mixed with a direct domain in one 2-D access."""
    src = """
W, H = Dims("W", "H")
Inputs(
    X=Unknown(float, (W, H), 0),
    A=Array(float, (W, H), 1),
    Xn=Sparse((W, H), (W,), 2),
    Yn=Sparse((W, H), (H,), 3),
)
w_fit = 0.2
x, y = W(), H()
xn = Xn(x, y)
yn = Yn(x, y)
r = Residuals(
    fit=w_fit * (X(x, y) - A(x, y)),
    reg=[X(x, y) - X(xn, y), X(x, y) - X(x, yn)],
)
"""
    rng = np.random.RandomState(0)
    W = H = 8
    a = rng.rand(W, H).astype(np.float32)
    xn = ((np.arange(W)[:, None] + 1) % W * np.ones((1, H), np.int64)).astype(np.int32)
    yn = (np.ones((W, 1), np.int64) * ((np.arange(H)[None, :] + 1) % H)).astype(np.int32)
    spec = tl.load_energy(src)
    plan = spec.plan({"W": W, "H": H})
    plan.set_solver_parameter("nIterations", 8)
    plan.set_solver_parameter("lIterations", 40)
    c0 = plan.init({"X": a.copy(), "A": a, "Xn": xn, "Yn": yn})
    final = plan.solve()
    assert final < c0

    # jacobian parity vs dense jacfwd oracle
    comp = plan.compiled
    U, ins = plan._U, plan._step_inputs()
    consts = comp.group_consts(ins)
    masks = comp.masks(ins, U)
    r_d, J_d = comp.dense_jacobian(U, ins, consts, masks)

    def res_all(Uv):
        return jnp.concatenate(
            [gp.group.residuals(Uv, ins, c).reshape(-1)
             for gp, c in zip(comp.groups, consts)])

    flat, unflatten = flatten_tree(U)
    J_o = jax.jacfwd(lambda v: res_all(unflatten(v)))(flat)
    np.testing.assert_allclose(np.asarray(J_d), np.asarray(J_o),
                               rtol=2e-4, atol=2e-5)


def test_complicated_graph_energy():
    """reference tests/complicated_graph_energy/complicated.t: nonlinear
    channel-mixing through two sparse maps plus a pointwise product."""
    src = """
X, E = Dims("X", "E")
Inputs(
    U=Unknown(float2, (X,), 0),
    Cor=Array(float2, (X,), 1),
    A=Sparse((E,), (X,), 3),
    B=Sparse((E,), (X,), 4),
)
x, e = X(), E()
C = Cor(A(e))
UA = U(A(e))
UB = U(B(e))
wA = UA(0) * C(0) + C(0)
wB = UB(0) * C(1) + UB(1)
r = Residuals(
    r0=wA - wB,
    r1=U(x) * Cor(x),
)
"""
    rng = np.random.RandomState(1)
    nX, nE = 14, 30
    A = rng.randint(0, nX, size=nE).astype(np.int32)
    B = ((A + 1 + rng.randint(0, nX - 1, size=nE)) % nX).astype(np.int32)
    ins = {"U": rng.rand(nX, 2).astype(np.float32),
           "Cor": rng.rand(nX, 2).astype(np.float32), "A": A, "B": B}
    spec = tl.load_energy(src)
    plan = spec.plan({"X": nX, "E": nE}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 10)
    c0 = plan.init(dict(ins))
    final = plan.solve()
    assert final < c0

    comp = plan.compiled
    U, ains = plan._U, plan._step_inputs()
    consts = comp.group_consts(ains)
    masks = comp.masks(ains, U)
    mjtf, diag, _ = comp.jtf_and_diag(U, ains, consts, masks, {})

    def res_all(Uv):
        return jnp.concatenate(
            [gp.group.residuals(Uv, ains, c).reshape(-1)
             for gp, c in zip(comp.groups, consts)])

    flat, unflatten = flatten_tree(U)
    J_o = jax.jacfwd(lambda v: res_all(unflatten(v)))(flat)
    r_o = res_all(U)
    jtf_flat, _ = flatten_tree(mjtf)
    np.testing.assert_allclose(np.asarray(jtf_flat),
                               np.asarray(-(J_o.T @ r_o)),
                               rtol=2e-4, atol=2e-5)


def test_expansive_sparse_materialize():
    """reference tests/expansive_sparse_materialize: a wide (12-channel)
    implicit computed array of a nonlinear function, materialized via
    get() hints and accessed through two sparse maps."""
    src = """
N, E = Dims("N", "E")
Inputs(
    X=Unknown(float3, (N,), 0),
    A=Array(float3, (N,), 1),
    v0=Sparse((E,), (N,), 2),
    v1=Sparse((E,), (N,), 3),
)
n, e = N(), E()

def weird(x):
    return Vector(x, x, x, x, x, x, x, x, x, x, x, x)

weirdest = weird(sin(X(n)(0) + X(n)(1) + X(n)(2)))
val = weirdest.get(v0(e)) - weirdest.get(v1(e))
weirdest.get(v0(e)).set_gradient_materialize(False)
weirdest.get(v0(e)).set_materialize(True)
r = Residuals(
    fit=X(n) - A(n),
    reg=val,
)
"""
    rng = np.random.RandomState(2)
    nN, nE = 12, 28
    v0 = rng.randint(0, nN, size=nE).astype(np.int32)
    v1 = ((v0 + 1 + rng.randint(0, nN - 1, size=nE)) % nN).astype(np.int32)
    ins = {"X": rng.rand(nN, 3).astype(np.float32),
           "A": rng.rand(nN, 3).astype(np.float32), "v0": v0, "v1": v1}
    finals = {}
    for mat in (True, False):
        src_m = src if mat else src.replace(
            "weirdest.get(v0(e)).set_materialize(True)\n", "")
        spec = tl.load_energy(src_m)
        plan = spec.plan({"N": nN, "E": nE}, solver="levenberg_marquardt")
        plan.set_solver_parameter("nIterations", 8)
        plan.set_solver_parameter("lIterations", 40)
        c0 = plan.init(dict(ins))
        finals[mat] = plan.solve()
        assert finals[mat] < c0
    # the materialize hint is answer-invariant
    assert np.isclose(finals[True], finals[False], rtol=1e-3), finals
