"""Degree-skew tolerance of the block-sparse J^T J path.

Real BAL scenes have power-law degree distributions (some points are
observed by hundreds of cameras; some cameras see most of the scene).
The reference's index inversion enumerates residuals-per-unknown at any
degree (/root/reference/API/src/thallo.t:3576-3712); the TPU build
matches that with level-bucketed row tables + one-hot row mode
(solver/blocksparse.py).  These tests pin the skewed path's J^T F,
diag(J^T J) and J^T J p against the dense jacfwd oracle, with and
without one-hot row mode."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import thallo_tpu as tl
from thallo_tpu.models import bundle_adjustment as ba
from tests.util import flatten_tree


def _skewed_ba(n_cams=10, n_pts=220, alpha=1.1, max_deg=64, seed=0):
    """Synthetic BA scene with power-law point degrees (BAL-like)."""
    rng = np.random.RandomState(seed)
    deg = np.clip((rng.pareto(alpha, n_pts) + 1).astype(int), 2, max_deg)
    base, _ = ba.synthetic_inputs(n_cameras=n_cams, n_points=n_pts,
                                  obs_per_point=2, seed=seed + 3)
    cams, pts = base["cameras"], base["points"]

    def project(cam, pt):
        aa, t = cam[0:3], cam[3:6]
        theta = np.linalg.norm(aa)
        if theta > 1e-12:
            w = aa / theta
            pp = (pt * np.cos(theta) + np.cross(w, pt) * np.sin(theta)
                  + w * np.dot(w, pt) * (1 - np.cos(theta)))
        else:
            pp = pt + np.cross(aa, pt)
        pp = pp + t
        cd = np.array([-pp[0] / pp[2], -pp[1] / pp[2]])
        r2 = cd @ cd
        return cd * cam[6] * (1.0 + r2 * (cam[7] + cam[8] * r2))

    oc, op, obs = [], [], []
    for j in range(n_pts):
        k = int(deg[j])
        for c in rng.choice(n_cams, size=k, replace=(k > n_cams)):
            oc.append(c)
            op.append(j)
            obs.append(project(cams[c].astype(np.float64),
                               pts[j].astype(np.float64)))
    O = len(oc)
    ins = {
        "cameras": (cams + 1e-3 * rng.randn(*cams.shape)).astype(np.float32),
        "points": (pts + 1e-2 * rng.randn(*pts.shape)).astype(np.float32),
        "observations": (np.asarray(obs)
                         + 0.5 * rng.randn(O, 2)).astype(np.float32),
        "oToC": np.asarray(oc, np.int32),
        "oToP": np.asarray(op, np.int32),
    }
    return ins, {"C": n_cams, "P": n_pts, "O": O}


def _forced_sparse_plan(sizes):
    spec = ba.make_spec()
    for nr in spec.energy:
        nr.JtJ.set_materialize(True)
        nr.JtJ.set_sparse(True)  # force BSR below the dense threshold
    return spec.plan(sizes, solver="levenberg_marquardt")


def _oracle_check(plan, ins_raw, seed=7):
    comp = plan.compiled
    U, ins = plan._U, plan._step_inputs()
    consts = plan._prep["consts"]
    masks = comp.masks(ins, U)

    def res_all(Uv):
        return jnp.concatenate(
            [gp.group.residuals(Uv, ins, c).reshape(-1)
             for gp, c in zip(comp.groups, consts)])

    flat, unflatten = flatten_tree(U)
    J = jax.jacfwd(lambda v: res_all(unflatten(v)))(flat)
    r = res_all(U)

    jac_store = {}
    mjtf, diag, jac_store = comp.jtf_and_diag(U, ins, consts, masks, jac_store)
    jtf_flat, _ = flatten_tree(mjtf)
    diag_flat, _ = flatten_tree(diag)
    np.testing.assert_allclose(
        np.asarray(jtf_flat), np.asarray(-(J.T @ r)), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(diag_flat), np.asarray(jnp.sum(J * J, axis=0)),
        rtol=5e-4, atol=5e-4)
    apply_jtjp = comp.make_jtjp(U, ins, consts, masks, jac_store)
    p = unflatten(jnp.asarray(
        np.random.RandomState(seed).randn(flat.size), jnp.float32))
    Ap_flat, _ = flatten_tree(apply_jtjp(p))
    pflat, _ = flatten_tree(p)
    scale = float(jnp.max(jnp.abs(Ap_flat))) + 1.0
    np.testing.assert_allclose(
        np.asarray(Ap_flat) / scale,
        np.asarray(J.T @ (J @ pflat)) / scale, rtol=2e-3, atol=2e-4)
    return jac_store


def _active_bsrs(plan):
    return [c["bsr"] for c in plan._prep["consts"]
            if isinstance(c, dict) and c.get("bsr") is not None]


def test_skewed_ba_bsr_active_and_exact():
    """Power-law degrees must NOT disable the BSR path (round-2 verdict:
    blocksparse bailed on skew), and the skewed tables must be exact."""
    ins, sizes = _skewed_ba()
    plan = _forced_sparse_plan(sizes)
    plan.init(ins)
    bsrs = _active_bsrs(plan)
    assert bsrs, "skewed BA must stay on the block-sparse path"
    b = bsrs[0]
    # the point table must have overflow levels (degree skew), and the
    # camera slot must run one-hot row mode (small image)
    assert any(s is not None for s in b.row_sels), \
        "expected overflow level tables for the power-law point degrees"
    assert any(x is not None for x in b.oh_idxs), \
        "expected one-hot row mode for the small camera image"
    assert any(pr[2] == "transpose" for pr in b.pairs)
    _oracle_check(plan, ins)


def test_skewed_ba_no_onehot_exact(monkeypatch):
    """Levels alone (one-hot row mode disabled) must also be exact —
    the camera side then builds skew-bucketed tables too."""
    monkeypatch.setenv("THALLO_ONEHOT_ROWS", "0")
    monkeypatch.setenv("THALLO_TRANSPOSE_ROWS", "0")
    ins, sizes = _skewed_ba(seed=5)
    plan = _forced_sparse_plan(sizes)
    plan.init(ins)
    bsrs = _active_bsrs(plan)
    assert bsrs
    b = bsrs[0]
    assert all(x is None for x in b.oh_idxs)
    assert all(pr[2] != "transpose" for pr in b.pairs)
    # the camera table is heavily skewed: multiple levels expected
    assert any(s is not None for s in b.row_sels)
    _oracle_check(plan, ins)


def test_skewed_ba_solve_matches_inline():
    """Full LM solve through the skewed BSR path follows the same
    trajectory as the INLINE (jvp/vjp) schedule on the same scene when
    both use the scalar Jacobi preconditioner (the BSR default is
    block-Jacobi, which converges differently by design)."""
    ins, sizes = _skewed_ba(n_cams=8, n_pts=150, seed=9)

    spec = ba.make_spec()
    for nr in spec.energy:
        nr.JtJ.set_materialize(True)
        nr.JtJ.set_sparse(True)
    plan = spec.plan(sizes, solver="levenberg_marquardt",
                     preconditioner="jacobi")
    plan.init({k: np.copy(v) for k, v in ins.items()})
    assert _active_bsrs(plan)
    for _ in range(6):
        plan.step()
    c_bsr = plan.cost()

    spec2 = ba.make_spec()
    for nr in spec2.energy:
        nr.JtJ.set_materialize(False)
        nr.J.set_materialize(False)
        nr.Jp.set_materialize(False)
    plan2 = spec2.plan(sizes, solver="levenberg_marquardt",
                       preconditioner="jacobi")
    plan2.init({k: np.copy(v) for k, v in ins.items()})
    for _ in range(6):
        plan2.step()
    np.testing.assert_allclose(c_bsr, plan2.cost(), rtol=1e-3, atol=1e-5)


def test_skewed_graph_energy_exact(monkeypatch):
    """Generic skewed graph (one unknown image, power-law vertex degrees,
    vertices >> one-hot threshold so both slots take the level path).
    The default THALLO_ONEHOT_ROWS is 1024 now; pin it below nN so this
    test keeps exercising the level tables it was written for."""
    monkeypatch.setenv("THALLO_ONEHOT_ROWS", "512")
    rng = np.random.RandomState(11)
    nN = 700
    # power-law out-degrees
    deg = np.clip((rng.pareto(1.0, nN) + 1).astype(int), 1, 80)
    v0 = np.repeat(np.arange(nN, dtype=np.int32), deg)
    v1 = rng.randint(0, nN, v0.size).astype(np.int32)
    bad = v1 == v0
    v1[bad] = (v1[bad] + 1) % nN
    nE = v0.size
    src = """
N, E = Dims("N", "E")
Inputs(X=Unknown(float2, (N,), 0), B=Array(float1, (E,), 1),
       v0=Sparse((E,), (N,), 2), v1=Sparse((E,), (N,), 3))
e = E()
r = Residuals(f=(X(v0(e)) - X(v1(e))).dot(X(v0(e))) - B(e))
"""
    spec = tl.load_energy(src)
    for nr in spec.energy:
        nr.JtJ.set_materialize(True)
        nr.JtJ.set_sparse(True)
    plan = spec.plan({"N": nN, "E": nE})
    ins = {
        "X": rng.randn(nN, 2).astype(np.float32),
        "B": rng.randn(nE, 1).astype(np.float32),
        "v0": v0, "v1": v1,
    }
    plan.init(ins)
    bsrs = _active_bsrs(plan)
    assert bsrs, "skewed graph must stay on the block-sparse path"
    assert any(s is not None for s in bsrs[0].row_sels)
    _oracle_check(plan, ins)


def test_skewed_schur_matches_direct():
    """schur_pcg / schur_dense on a skewed scene (level tables + one-hot
    camera slot + transpose pairs) approach the dense direct solve of
    the damped normal equations — and get there MUCH closer than
    full-system PCG at the same budget.  The skewed scene's normal
    equations are ill-conditioned enough that 400 block-Jacobi PCG
    iterations in f32 stall ~25% from the direct delta, while the
    reduced camera system converges to ~2% — the conditioning win that
    motivates the Schur solvers (the Ceres ITERATIVE_SCHUR rationale;
    quantified on hardware in PERF.md)."""
    ins, sizes = _skewed_ba(n_cams=6, n_pts=120, seed=13)

    def first_delta(**opts):
        spec = ba.make_spec()
        for nr in spec.energy:
            nr.JtJ.set_materialize(True)
            nr.JtJ.set_sparse(True)
        plan = spec.plan(sizes, solver="levenberg_marquardt", **opts)
        plan.set_solver_parameter("lIterations", 400)
        plan.set_solver_parameter("q_tolerance", 0.0)
        plan.init({k: np.copy(v) for k, v in ins.items()})
        comp = plan.compiled
        U, inputs, sp, prep = (plan._U, plan._step_inputs(), plan._sp(),
                               plan._prep)
        state = comp.solve_setup(U, plan._lm, inputs, sp, prep)
        d = comp.linear_solve(U, state, inputs, sp, prep)
        return {k: np.asarray(v) for k, v in d.items()}

    d_direct = first_delta(linear_solver="direct")

    def rel_err(d):
        return max(float(np.abs(d[k] - d_direct[k]).max()
                         / np.abs(d_direct[k]).max()) for k in d_direct)

    err_pcg = rel_err(first_delta(linear_solver="pcg"))
    err_schur = rel_err(first_delta(linear_solver="schur_pcg"))
    err_dense = rel_err(first_delta(linear_solver="schur_dense"))
    # plumbing correctness: the reduced solves track the direct delta
    # (f32 conditioning bounds how tight this can be on a skewed scene)
    assert err_schur < 0.05, err_schur
    assert err_dense < 0.03, err_dense
    # the conditioning win: full-system PCG is far further away
    assert err_pcg > 3 * err_schur, (err_pcg, err_schur)


def test_overflow_merge_forms_match(monkeypatch):
    """Both overflow-merge strategies (merged row scatter, the measured
    default, vs per-level lane scatters, THALLO_MERGE_SCATTER=0) produce
    the same J^T J p on a skewed scene."""
    ins, sizes = _skewed_ba()
    outs = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("THALLO_MERGE_SCATTER", mode)
        plan = _forced_sparse_plan(sizes)
        plan.init({k: np.copy(v) for k, v in ins.items()})
        plan.set_solver_parameter("nIterations", 3)
        outs[mode] = plan.solve()
    assert np.isfinite(outs["1"])
    np.testing.assert_allclose(outs["1"], outs["0"], rtol=1e-5)
