"""Randomized lowering fuzz: generate small random energies (stencil
offsets, sparse gathers, multi-channel unknowns, guards, nonlinearities,
contractions) and check the solver's derivative machinery — per-point
jacobians, scatter transposes, dense assembly, JTJp — against pure
jax.jacfwd of the same lowered residual function.  This hardens exactly
the hand-built parts (index lowering, roll/segment scatters, column
indexing); the forward evaluation itself is covered by the hand-written
oracle tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import thallo_tpu as tl
from tests.util import flatten_tree


def random_energy(rng):
    """Returns (energy source, dim sizes, input maker)."""
    kind = rng.choice(["grid", "graph", "contract"])
    uch = int(rng.choice([1, 2, 3]))
    ach = int(rng.choice([1, 2]))
    nl = rng.choice(["sin", "sqrtabs", "mul", "none"])

    def wrap_nl(e):
        if nl == "sin":
            return f"sin({e})"
        if nl == "sqrtabs":
            return f"sqrt(abs({e}) + 0.1)"
        if nl == "mul":
            return f"({e}) * ({e})"
        return e

    if kind == "grid":
        ox, oy = int(rng.randint(-2, 3)), int(rng.randint(-2, 3))
        if (ox, oy) == (0, 0):
            ox = 1  # avoid aliased accesses within one residual: the diag
            # intentionally matches the reference's per-access definition,
            # which differs from the true diagonal under aliasing
        guard = rng.choice([True, False])
        body = f"X(x + {ox}, y + {oy}) - A(x, y)"
        if uch > 1:
            body = f"({body}).dot(X(x, y))" if rng.rand() < 0.5 else f"({body})({rng.randint(uch)})"
        e = wrap_nl(body)
        if guard:
            e = f"Select(InBounds(x + {ox}, y + {oy}), {e}, 0)"
        src = f"""
W, H = Dims("W", "H")
Inputs(X=Unknown(float{uch}, (W, H), 0), A=Array(float{uch}, (W, H), 1),
       p0=Param(float, 2))
x, y = W(), H()
r = Residuals(f=p0 * ({e}))
"""
        sizes = {"W": 5, "H": 4}

        def mk(rng2):
            return {
                "X": rng2.randn(5, 4, uch).astype(np.float32),
                "A": rng2.randn(5, 4, uch).astype(np.float32),
                "p0": 1.3,
            }

        return src, sizes, mk

    if kind == "graph":
        e = wrap_nl(f"X(v0(ee)) - 0.7 * X(v1(ee))")
        if uch > 1:
            e = f"({e}).sum()"
        src = f"""
N, E = Dims("N", "E")
Inputs(X=Unknown(float{uch}, (N,), 0), B=Array(float{ach}, (E,), 1),
       v0=Sparse((E,), (N,), 2), v1=Sparse((E,), (N,), 3))
n, ee = N(), E()
r = Residuals(fit=X(n).sum() if {uch} > 1 else X(n),
              reg=B(ee)(0) * ({e}))
"""
        nN, nE = 7, 11

        def mk(rng2):
            return {
                "X": rng2.randn(nN, uch).astype(np.float32),
                "B": rng2.randn(nE, ach).astype(np.float32),
                # v0 != v1 per edge (see aliasing note above)
                "v0": (v0 := rng2.randint(0, nN, nE).astype(np.int32)),
                "v1": ((v0 + 1 + rng2.randint(0, nN - 1, nE)) % nN).astype(np.int32),
            }

        return src, {"N": nN, "E": nE}, mk

    # contraction
    off = int(rng.randint(0, 3))
    src = f"""
N, K = Dims("N", "K")
Inputs(C=Unknown(float, (K,), 0), R=Array(float, (N,), 1), T=Array(float, (N,), 2))
n, k = N(), K()
acc = Sum([k], R(n - k + {off}) * C(k))
r = Residuals(conv={wrap_nl('T(n) - acc')})
"""
    nN, nK = 9, 3

    def mk(rng2):
        return {
            "C": rng2.randn(nK).astype(np.float32),
            "R": rng2.randn(nN).astype(np.float32),
            "T": rng2.randn(nN).astype(np.float32),
        }

    return src, {"N": nN, "K": nK}, mk


@pytest.mark.parametrize("seed", range(24))
def test_fuzz_jacobian_machinery(seed):
    rng = np.random.RandomState(seed)
    src, sizes, mk = random_energy(rng)
    spec = tl.load_energy(src)
    plan = spec.plan(sizes)
    inputs = mk(np.random.RandomState(seed + 1000))
    plan.init(inputs)

    comp = plan.compiled
    U, ins = plan._U, plan._step_inputs()
    consts = comp.group_consts(ins)
    masks = comp.masks(ins, U)

    # oracle: jacfwd of the lowered residual forward
    def res_all(Uv):
        return jnp.concatenate(
            [gp.group.residuals(Uv, ins, c).reshape(-1) for gp, c in zip(comp.groups, consts)]
        )

    flat, unflatten = flatten_tree(U)
    J_oracle = jax.jacfwd(lambda v: res_all(unflatten(v)))(flat)
    r_oracle = res_all(U)

    # 1. dense assembly from per-point jacobians
    r_d, J_d = comp.dense_jacobian(U, ins, consts, masks)
    np.testing.assert_allclose(np.asarray(r_d), np.asarray(r_oracle), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(J_d), np.asarray(J_oracle), rtol=2e-4, atol=2e-5)

    # 2. J^T F and diag(J^T J)
    mjtf, diag, _ = comp.jtf_and_diag(U, ins, consts, masks, {})
    jtf_flat, _ = flatten_tree(mjtf)
    diag_flat, _ = flatten_tree(diag)
    np.testing.assert_allclose(
        np.asarray(jtf_flat), np.asarray(-(J_oracle.T @ r_oracle)), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(diag_flat), np.asarray(jnp.sum(J_oracle * J_oracle, axis=0)),
        rtol=2e-4, atol=2e-5,
    )

    # 3. matrix-free JTJp against the dense product
    apply_jtjp = comp.make_jtjp(U, ins, consts, masks, {})
    p = unflatten(jnp.asarray(np.random.RandomState(seed + 2000).randn(flat.size), jnp.float32))
    Ap_flat, _ = flatten_tree(apply_jtjp(p))
    pflat, _ = flatten_tree(p)
    np.testing.assert_allclose(
        np.asarray(Ap_flat), np.asarray(J_oracle.T @ (J_oracle @ pflat)),
        rtol=5e-4, atol=5e-5,
    )


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_exclusion_and_materialized_ca(seed):
    """Exclusion masks + materialized computed arrays under the same
    oracle: masked columns must vanish from J; materialization must not
    change J at all."""
    rng = np.random.RandomState(seed + 50)
    ox = int(rng.choice([1, 2]))
    mat = bool(rng.rand() < 0.5)
    src = f"""
W, H = Dims("W", "H")
Inputs(X=Unknown(float, (W, H), 0), A=Array(float, (W, H), 1),
       M=Array(float, (W, H), 2))
x, y = W(), H()
X.Exclude(eq(M(x, y), 1))
ca = ComputedArray("ca", [x, y], X(x, y) * X(x, y) + A(x, y))
{"ca.set_materialize(True)" if mat else ""}
r = Residuals(f=Select(InBounds(x + {ox}, y), ca(x, y) - ca(x + {ox}, y), 0))
"""
    n = 5
    spec = tl.load_energy(src)
    plan = spec.plan({"W": n, "H": n})
    rng2 = np.random.RandomState(seed + 77)
    Mmask = (rng2.rand(n, n) < 0.3).astype(np.float32)
    plan.init({"X": rng2.randn(n, n).astype(np.float32),
               "A": rng2.randn(n, n).astype(np.float32),
               "M": Mmask})
    r_d, J_d = plan.jacobian(dense=True)
    J_d = np.asarray(J_d)
    # excluded columns are exactly zero
    excluded = Mmask.reshape(-1) == 1
    assert (J_d[:, excluded] == 0).all()
    # non-excluded columns match the masked jacfwd oracle
    comp = plan.compiled
    U, ins = plan._U, plan._step_inputs()
    consts = comp.group_consts(ins)

    def res_all(Uv):
        return jnp.concatenate(
            [gp.group.residuals(Uv, ins, c).reshape(-1) for gp, c in zip(comp.groups, consts)]
        )

    flat, unflatten = flatten_tree(U)
    J_oracle = np.asarray(jax.jacfwd(lambda v: res_all(unflatten(v)))(flat))
    np.testing.assert_allclose(J_d[:, ~excluded], J_oracle[:, ~excluded], rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_block_sparse_schedule(seed):
    """The block-sparse materialized-JtJ pipeline (BSR tables +
    channel-major jacobians + block-Jacobi preconditioner inputs) fuzzed
    against the dense jacfwd oracle: set_sparse forces the BSR path even
    at fuzz sizes, so jtf/diag/JTJp must still match exactly."""
    rng = np.random.RandomState(seed + 500)
    src, sizes, mk = random_energy(rng)
    if "Sparse(" not in src:
        pytest.skip("not a graph energy")
    spec = tl.load_energy(src)
    for nr in spec.energy:
        nr.JtJ.set_materialize(True)
        nr.JtJ.set_sparse(True)
    plan = spec.plan(sizes)
    inputs = mk(np.random.RandomState(seed + 1500))
    plan.init(inputs)

    comp = plan.compiled
    assert any(gp.force_sparse for gp in comp.groups)
    U, ins = plan._U, plan._step_inputs()
    consts = plan._prep["consts"]
    assert any(
        isinstance(c, dict) and c.get("bsr") is not None for c in consts
    ), "fuzz energy did not build BSR tables"
    masks = comp.masks(ins, U)

    def res_all(Uv):
        return jnp.concatenate(
            [gp.group.residuals(Uv, ins, c).reshape(-1)
             for gp, c in zip(comp.groups, consts)]
        )

    flat, unflatten = flatten_tree(U)
    J_oracle = jax.jacfwd(lambda v: res_all(unflatten(v)))(flat)
    r_oracle = res_all(U)

    jac_store = {}
    mjtf, diag, jac_store = comp.jtf_and_diag(U, ins, consts, masks, jac_store)
    jtf_flat, _ = flatten_tree(mjtf)
    diag_flat, _ = flatten_tree(diag)
    np.testing.assert_allclose(
        np.asarray(jtf_flat), np.asarray(-(J_oracle.T @ r_oracle)),
        rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(diag_flat), np.asarray(jnp.sum(J_oracle * J_oracle, axis=0)),
        rtol=2e-4, atol=2e-5)

    apply_jtjp = comp.make_jtjp(U, ins, consts, masks, jac_store)
    p = unflatten(jnp.asarray(
        np.random.RandomState(seed + 2500).randn(flat.size), jnp.float32))
    Ap_flat, _ = flatten_tree(apply_jtjp(p))
    pflat, _ = flatten_tree(p)
    np.testing.assert_allclose(
        np.asarray(Ap_flat), np.asarray(J_oracle.T @ (J_oracle @ pflat)),
        rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_schur_matches_direct(seed):
    """Schur elimination fuzzed against the dense direct solve: on random
    eligible energies (two unknowns, each accessed through a single map,
    random channels/nonlinearity) the first-step Schur delta must equal
    the exact solution of the same damped normal equations."""
    rng = np.random.RandomState(seed + 900)
    cx = int(rng.choice([1, 2, 3]))
    cy = int(rng.choice([1, 2, 3]))
    Nn = int(rng.randint(8, 30))
    Mm = int(rng.randint(8, 30))
    Ee = int(rng.randint(40, 120))
    nl = rng.choice(["mul", "sq", "lin"])
    xe, ye = f"X(vx(e))({rng.randint(cx)})", f"Y(vy(e))({rng.randint(cy)})"
    if nl == "mul":
        body = f"{xe} * {ye} - A(e)"
    elif nl == "sq":
        body = f"{xe} * {xe} + {ye} - A(e)"
    else:
        body = f"{xe} - 2.0 * {ye} + A(e)"
    src = f"""
N, M, E = Dims("N", "M", "E")
Inputs(
    X=Unknown(float{cx}, (N,), 0),
    Y=Unknown(float{cy}, (M,), 1),
    A=Array(float, (E,), 2),
    vx=Sparse((E,), (N,), 3),
    vy=Sparse((E,), (M,), 4),
)
e = E()
r = Residuals(f={body})
"""
    ins = {
        "X": (1.0 + 0.2 * rng.rand(Nn, cx)).astype(np.float32),
        "Y": (1.0 + 0.2 * rng.rand(Mm, cy)).astype(np.float32),
        "A": rng.rand(Ee).astype(np.float32),
        "vx": rng.randint(0, Nn, size=Ee).astype(np.int32),
        "vy": rng.randint(0, Mm, size=Ee).astype(np.int32),
    }

    def first_delta(**opts):
        spec = tl.load_energy(src)
        plan = spec.plan({"N": Nn, "M": Mm, "E": Ee},
                         solver="levenberg_marquardt", **opts)
        plan.set_solver_parameter("lIterations", 250)
        plan.set_solver_parameter("q_tolerance", 0.0)
        plan.init({k: np.copy(v) for k, v in ins.items()})
        comp = plan.compiled
        U, step_ins = plan._U, plan._step_inputs()
        sp, prep = plan._sp(), plan._prep
        state = comp.solve_setup(U, plan._lm, step_ins, sp, prep)
        d = comp.linear_solve(U, state, step_ins, sp, prep)
        return {k: np.asarray(v) for k, v in d.items()}

    d_direct = first_delta(linear_solver="direct")
    elim = "X" if rng.rand() < 0.5 else "Y"
    d_schur = first_delta(linear_solver="schur_pcg", schur_eliminate=[elim])
    for k in d_direct:
        scale = max(np.abs(d_direct[k]).max(), 1e-6)
        err = np.abs(d_schur[k] - d_direct[k]).max()
        assert err < 1e-2 * scale, (seed, elim, k, err, scale)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_block_sparse_structured(seed):
    """The structured-index BSR fast path (ops/structured.py) fuzzed
    against the dense jacfwd oracle: grid-structured edges (with a
    random nonlinearity / channel count) must build AFFINE column plans
    and still reproduce jtf / diag / JTJp exactly.  Odd seeds shuffle
    one endpoint map so only some columns stay planned (mixed
    windowed + gathered execution)."""
    rng = np.random.RandomState(seed + 4000)
    uch = int(rng.choice([1, 2, 3]))
    nl = ["sin", "sqrtabs", "mul", "none"][seed % 4]
    e = "X(v0(ee)) - 0.7 * X(v1(ee))"
    if nl == "sin":
        e = f"sin({e})"
    elif nl == "sqrtabs":
        e = f"sqrt(abs({e}) + 0.1)"
    elif nl == "mul":
        e = f"({e}) * ({e})"
    if uch > 1:
        e = f"({e}).sum()"
    src = f"""
N, E = Dims("N", "E")
Inputs(X=Unknown(float{uch}, (N,), 0), B=Array(float, (E,), 1),
       v0=Sparse((E,), (N,), 2), v1=Sparse((E,), (N,), 3))
n, ee = N(), E()
r = Residuals(fit=X(n).sum() if {uch} > 1 else X(n),
              reg=B(ee)(0) * ({e}))
"""
    side = int(rng.choice([4, 5]))
    nN = side * side
    vid = np.arange(nN, dtype=np.int32).reshape(side, side)
    down = np.stack([vid[:-1, :].ravel(), vid[1:, :].ravel()], axis=1)
    right = np.stack([vid[:, :-1].ravel(), vid[:, 1:].ravel()], axis=1)
    edges = np.concatenate([down, down[:, ::-1], right, right[:, ::-1]], 0)
    nE = len(edges)
    v0, v1 = edges[:, 0].copy(), edges[:, 1].copy()
    mixed = bool(seed % 2)
    if mixed:  # break v1's structure: only v0's columns stay planned
        v1 = rng.randint(0, nN, nE).astype(np.int32)
        bad = v1 == v0  # keep v0 != v1 (aliasing note in random_energy)
        v1[bad] = (v1[bad] + 1) % nN

    spec = tl.load_energy(src)
    for nr in spec.energy:
        nr.JtJ.set_materialize(True)
        nr.JtJ.set_sparse(True)
    plan = spec.plan({"N": nN, "E": nE})
    inputs = {
        "X": rng.randn(nN, uch).astype(np.float32),
        "B": rng.randn(nE, 1).astype(np.float32),
        "v0": v0, "v1": v1,
    }
    plan.init(inputs)

    comp = plan.compiled
    U, ins = plan._U, plan._step_inputs()
    consts = plan._prep["consts"]
    bsrs = [c["bsr"] for c in consts
            if isinstance(c, dict) and c.get("bsr") is not None]
    assert bsrs, "structured fuzz energy did not build BSR tables"
    planned = [p for b in bsrs for pl in b.perm_plans for p in pl]
    assert any(p is not None for p in planned), \
        "grid edges should produce affine column plans"
    if not mixed:
        assert all(p is not None for p in planned)
    masks = comp.masks(ins, U)

    def res_all(Uv):
        return jnp.concatenate(
            [gp.group.residuals(Uv, ins, c).reshape(-1)
             for gp, c in zip(comp.groups, consts)]
        )

    flat, unflatten = flatten_tree(U)
    J_oracle = jax.jacfwd(lambda v: res_all(unflatten(v)))(flat)
    r_oracle = res_all(U)

    jac_store = {}
    mjtf, diag, jac_store = comp.jtf_and_diag(U, ins, consts, masks, jac_store)
    jtf_flat, _ = flatten_tree(mjtf)
    diag_flat, _ = flatten_tree(diag)
    np.testing.assert_allclose(
        np.asarray(jtf_flat), np.asarray(-(J_oracle.T @ r_oracle)),
        rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(diag_flat), np.asarray(jnp.sum(J_oracle * J_oracle, axis=0)),
        rtol=2e-4, atol=2e-5)
    apply_jtjp = comp.make_jtjp(U, ins, consts, masks, jac_store)
    p = unflatten(jnp.asarray(
        np.random.RandomState(seed + 4500).randn(flat.size), jnp.float32))
    Ap_flat, _ = flatten_tree(apply_jtjp(p))
    pflat, _ = flatten_tree(p)
    np.testing.assert_allclose(
        np.asarray(Ap_flat), np.asarray(J_oracle.T @ (J_oracle @ pflat)),
        rtol=5e-4, atol=5e-5)
