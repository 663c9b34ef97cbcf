"""Contraction blocking (the real `split`, reference thallo.t:5678-5727 +
in-register contraction thallo.t:5821-5884): a split(domain, B) directive
(or an over-budget fiber) makes the group evaluate its Sum(...) nodes as
a checkpointed lax.scan over K-blocks, bounding the materialized fiber to
[R, B, ...] instead of the full (R x K) cross-product."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import thallo_tpu as tl
from tests.util import flatten_tree

ENERGY = """
W, H, Kd, Kc = Dims("W", "H", "Kd", "Kc")
Inputs(
    X=Unknown(float, (W, H), 0),
    B=Array(float, (W, H), 1),
    K=Array(float, (Kd, Kd, Kc), 2),
    S=Sparse((W, H), (Kc,), 3),
)
k_0 = Kd()
k_1 = Kd()
x = W()
y = H()
c = S(x, y)
kx = Sum([k_0, k_1], K(k_0, k_1, c) * X(x - k_0 + 2, y - k_1 + 2))
r = Residuals(conv=kx - B(x, y), reg=0.3 * (X(x, y) - B(x, y)))
{directive}
"""


def _inputs(W, H, Kd=5, Kc=2, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "X": rng.rand(W, H).astype(np.float32),
        "B": rng.rand(W, H).astype(np.float32),
        "K": rng.rand(Kd, Kd, Kc).astype(np.float32),
        "S": (np.arange(W * H).reshape(W, H) % Kc).astype(np.int32),
    }


def _plan(W, H, directive="", Kd=5, **opts):
    spec = tl.load_energy(ENERGY.format(directive=directive))
    return spec.plan({"W": W, "H": H, "Kd": Kd, "Kc": 2}, **opts)


def _con_groups(plan):
    return [gp.group for gp in plan.compiled.groups
            if gp.group.con_domains]


def test_split_directive_blocks_and_matches():
    """split(k_0, 1) forces 5 scan blocks; cost/jtf/diag/solve match the
    unblocked build exactly."""
    W = H = 12
    ins = _inputs(W, H)

    pu = _plan(W, H)
    assert all(g.con_block is None for g in _con_groups(pu))
    pb = _plan(W, H, directive="r.conv.split(k_0, 1)")
    gs = _con_groups(pb)
    assert gs and any(g.con_block is not None for g in gs)
    g = next(g for g in gs if g.con_block is not None)
    assert g.con_block[1] == 1 and g.con_block[2] == 5

    cu = pu.init({k: np.copy(v) for k, v in ins.items()})
    cb = pb.init({k: np.copy(v) for k, v in ins.items()})
    np.testing.assert_allclose(cu, cb, rtol=1e-5)

    # jtf/diag vs the dense jacfwd oracle through the BLOCKED machinery
    comp = pb.compiled
    U, inputs = pb._U, pb._step_inputs()
    consts = pb._prep["consts"]
    masks = comp.masks(inputs, U)

    def res_all(Uv):
        return jnp.concatenate(
            [gp.group.residuals(Uv, inputs, c).reshape(-1)
             for gp, c in zip(comp.groups, consts)])

    flat, unflatten = flatten_tree(U)
    J = jax.jacfwd(lambda v: res_all(unflatten(v)))(flat)
    r = res_all(U)
    mjtf, diag, _ = comp.jtf_and_diag(U, inputs, consts, masks, {})
    jtf_flat, _ = flatten_tree(mjtf)
    diag_flat, _ = flatten_tree(diag)
    np.testing.assert_allclose(np.asarray(jtf_flat),
                               np.asarray(-(J.T @ r)), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(diag_flat),
                               np.asarray(jnp.sum(J * J, axis=0)),
                               rtol=2e-4, atol=2e-5)
    # JtJp (INLINE through the blocked scan) vs oracle
    apply_jtjp = comp.make_jtjp(U, inputs, consts, masks, {})
    p = unflatten(jnp.asarray(
        np.random.RandomState(3).randn(flat.size), jnp.float32))
    Ap_flat, _ = flatten_tree(apply_jtjp(p))
    pflat, _ = flatten_tree(p)
    np.testing.assert_allclose(np.asarray(Ap_flat),
                               np.asarray(J.T @ (J @ pflat)),
                               rtol=5e-4, atol=5e-5)

    # full solves agree
    fu = pu.solve()
    fb = pb.solve()
    np.testing.assert_allclose(fu, fb, rtol=1e-3, atol=1e-7)


def test_auto_blocking_over_budget(monkeypatch):
    """Without a directive, an over-budget fiber activates blocking."""
    monkeypatch.setenv("THALLO_CON_BLOCK_BYTES", "4096")
    W = H = 12
    pb = _plan(W, H)
    g = next(g for g in _con_groups(pb) if g.con_block is not None)
    assert g.con_block[2] > 1
    ins = _inputs(W, H)
    c0 = pb.init(ins)
    f = pb.solve()
    assert f < 0.5 * c0


def test_blocked_fiber_memory_is_bounded():
    """At production-ish scale (128^2 x 9x9 here; the 512^2 x 17^2 case
    scales identically), the traced residual evaluation must create NO
    intermediate of the full R x K cross-product — the blocked scan's
    largest fiber is R x B x K1."""
    W = H = 128
    Kd = 9
    pb = _plan(W, H, directive="r.conv.split(k_0, 1)", Kd=Kd)
    g = next(g for g in _con_groups(pb) if g.con_block is not None)
    assert g.con_block[1] == 1
    ins = _inputs(W, H, Kd=Kd)
    pb.init(ins)
    comp = pb.compiled
    U, inputs = pb._U, pb._step_inputs()
    consts = pb._prep["consts"]
    gi = next(i for i, gp in enumerate(comp.groups)
              if gp.group.con_block is not None)
    jaxpr = jax.make_jaxpr(
        lambda Uv: comp.groups[gi].group.residuals(Uv, inputs, consts[gi])
    )(U)
    R, K = W * H, Kd * Kd
    cap = R * K  # the unblocked cross-product element count

    def max_elems(jp):
        m = 0
        for eqn in jp.eqns:
            for v in eqn.outvars:
                if hasattr(v.aval, "shape"):
                    m = max(m, int(np.prod(v.aval.shape, dtype=np.int64)))
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    m = max(m, max_elems(sub.jaxpr))
        return m

    peak = max_elems(jaxpr.jaxpr)
    assert peak < cap, (peak, cap)
    # and it still evaluates
    r = comp.groups[gi].group.residuals(U, inputs, consts[gi])
    assert np.isfinite(np.asarray(r)).all()
