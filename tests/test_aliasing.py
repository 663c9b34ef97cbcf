"""Aliased graph accesses (v0(e) == v1(e) for some edges): pins the
documented diag semantics and the exactness of everything else.

The reference scatters diag(J^T J) per ACCESS (createjtfResidualwise,
/root/reference/API/src/thallo.t:3895-3902), so when two accesses of one
residual alias the same physical unknown the preconditioner gets a^2+b^2
instead of the true (a+b)^2 — solver/gn.py documents matching this
exactly.  J, J^T F and J^T J p are linear in the scatters and must be
EXACT under aliasing, on both the scatter path and the block-sparse
materialized-JtJ path (solver/blocksparse.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import thallo_tpu as tl
from tests.util import flatten_tree

SRC = """
N, E = Dims("N", "E")
Inputs(X=Unknown(float2, (N,), 0), B=Array(float, (E,), 1),
       v0=Sparse((E,), (N,), 2), v1=Sparse((E,), (N,), 3))
n, ee = N(), E()
r = Residuals(fit=0.3 * X(n).sum(),
              reg=B(ee) * (X(v0(ee)) + 0.5 * X(v1(ee))).sum())
"""

nN, nE = 6, 12


def _aliased_inputs(seed=0):
    rng = np.random.RandomState(seed)
    v0 = rng.randint(0, nN, nE).astype(np.int32)
    v1 = v0.copy()
    # half the edges alias (v0 == v1), half don't
    flip = rng.rand(nE) < 0.5
    v1[flip] = (v0[flip] + 1 + rng.randint(0, nN - 1, int(flip.sum()))) % nN
    assert (v0 == v1).any() and (v0 != v1).any()
    return {
        "X": rng.randn(nN, 2).astype(np.float32),
        "B": rng.randn(nE).astype(np.float32),
        "v0": v0,
        "v1": v1,
    }


def _build(monkeypatch, force_bsr):
    if force_bsr:
        import thallo_tpu.schedule as sched

        monkeypatch.setattr(sched, "DENSE_JTJ_MAX_UNKNOWNS", 1)
    spec = tl.load_energy(SRC)
    plan = spec.plan({"N": nN, "E": nE})
    plan.init(_aliased_inputs())
    return plan


@pytest.mark.parametrize("force_bsr", [False, True])
def test_aliased_accesses(monkeypatch, force_bsr):
    plan = _build(monkeypatch, force_bsr)
    comp = plan.compiled
    U, ins = plan._U, plan._step_inputs()
    prep = plan._prep
    consts = prep["consts"]
    masks = comp.masks(ins, U)
    if force_bsr:
        # the graph group must actually take the block-sparse path
        assert any(c.get("bsr") is not None for c in consts)

    def res_all(Uv):
        return jnp.concatenate(
            [gp.group.residuals(Uv, ins, c).reshape(-1)
             for gp, c in zip(comp.groups, consts)]
        )

    flat, unflatten = flatten_tree(U)
    J = np.asarray(jax.jacfwd(lambda v: res_all(unflatten(v)))(flat))
    r = np.asarray(res_all(U))

    # J itself is exact under aliasing (dense assembly path)
    r_d, J_d = comp.dense_jacobian(U, ins, consts, masks)
    np.testing.assert_allclose(np.asarray(J_d), J, rtol=2e-4, atol=2e-5)

    # J^T F exact; diag follows the per-access definition
    mjtf, diag, jac_store = comp.jtf_and_diag(U, ins, consts, masks, {},
                                              prep["twin_consts"])
    jtf_flat, _ = flatten_tree(mjtf)
    np.testing.assert_allclose(np.asarray(jtf_flat), -(J.T @ r), rtol=2e-4, atol=2e-5)

    # per-access diag oracle: scatter each slot's squared point-jacobian
    # separately (reference thallo.t:3895-3902)
    diag_oracle = {k: np.zeros_like(np.asarray(v)) for k, v in diag.items()}
    for gi, gp in enumerate(comp.groups):
        g = gp.group
        if not g.uslots:
            continue
        _, jacs = g.point_jacobians(U, ins, consts[gi])
        for i in range(len(g.uslots)):
            d2 = np.asarray(jnp.sum(jacs[i] * jacs[i], axis=1))  # [R, C]
            idx = np.asarray(g.slot_flat_indices(i, ins)).reshape(-1)
            name = g.uslots[i].image.name
            np.add.at(diag_oracle[name], idx, d2)
    for k in diag:
        np.testing.assert_allclose(np.asarray(diag[k]), diag_oracle[k],
                                   rtol=2e-4, atol=2e-5)
    # under aliasing the per-access diag differs from the true diagonal
    true_diag = np.sum(J * J, axis=0)
    diag_flat, _ = flatten_tree(diag)
    assert not np.allclose(np.asarray(diag_flat), true_diag)

    # J^T J p exact under aliasing on the scheduled path
    apply_jtjp = comp.make_jtjp(U, ins, consts, masks, jac_store,
                                prep["twin_consts"])
    rng = np.random.RandomState(7)
    p = unflatten(jnp.asarray(rng.randn(flat.size), jnp.float32))
    Ap_flat, _ = flatten_tree(apply_jtjp(p))
    pflat, _ = flatten_tree(p)
    np.testing.assert_allclose(np.asarray(Ap_flat), J.T @ (J @ pflat),
                               rtol=5e-4, atol=5e-5)


def test_aliased_solve_agrees(monkeypatch):
    """End-to-end: the block-sparse schedule and the matrix-free schedule
    converge to the same cost on the aliased graph."""
    finals = []
    for force in (False, True):
        with pytest.MonkeyPatch.context() as mp:
            plan = _build(mp, force)
            plan.set_solver_parameter("nIterations", 5)
            plan.set_solver_parameter("lIterations", 10)
            finals.append(plan.solve())
    assert np.isclose(finals[0], finals[1], rtol=1e-4), finals
