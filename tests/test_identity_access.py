"""Identity sparse-access detection (lower._IndexEnv.eval_sparse):
a plain `sparse(e)` access over the full residual domain must return
the index column directly — otherwise XLA re-runs a full-length gather
of the index array INSIDE every jitted step (measured 1.7 ms at BA
250k, PERF.md round 3b)."""
import jax
import jax.extend  # noqa: F401
import numpy as np

import thallo_tpu as tl

GRAPH_ENERGY = """
N, E = Dims("N", "E")
Inputs(X=Unknown(float, (N,), 0),
       T=Array(float, (N,), 1),
       v0=Sparse((E,), (N,), 2),
       v1=Sparse((E,), (N,), 3))
e = E()
r = Residuals(fit=X(v0(e)) - X(v1(e)) - (T(v0(e)) - T(v1(e))))
"""


def _subjaxprs(eqn):
    closed = jax.extend.core.ClosedJaxpr
    out = []
    for v in eqn.params.values():
        if isinstance(v, closed):
            out.append(v.jaxpr)
        elif hasattr(v, "eqns"):
            out.append(v)
        elif isinstance(v, (tuple, list)):
            out.extend(x.jaxpr if isinstance(x, closed) else x for x in v
                       if isinstance(x, closed) or hasattr(x, "eqns"))
    return out


def _count_int_gathers(jaxpr):
    n = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in ("gather", "take"):
            src = eqn.invars[0]
            if hasattr(src, "aval") and np.issubdtype(
                    np.dtype(src.aval.dtype), np.integer):
                n += 1
        for sub in _subjaxprs(eqn):
            n += _count_int_gathers(sub)
    return n


def _shuffled_inputs(n=64, seed=0):
    """Unstructured edges (shuffled), so the affine fast path cannot
    hide the gathers this test counts."""
    rng = np.random.default_rng(seed)
    v0 = np.repeat(np.arange(n, dtype=np.int32), 2)
    v1 = np.roll(v0, 1)
    perm = rng.permutation(len(v0))
    t = rng.standard_normal(n).astype(np.float32)
    return {"X": t + 0.1 * rng.standard_normal(n).astype(np.float32),
            "T": t, "v0": v0[perm], "v1": v1[perm]}


def test_identity_access_skips_index_gather():
    inputs = _shuffled_inputs()
    spec = tl.load_energy(GRAPH_ENERGY)
    plan = spec.plan({"N": 64, "E": len(inputs["v0"])},
                     solver="gauss_newton")
    plan.init(inputs)
    comp = plan.compiled
    g = comp.groups[0].group
    consts = plan._prep["consts"][0]
    jaxpr = jax.make_jaxpr(
        lambda X: g.residuals_cm(X, plan._step_inputs(), consts)
        if g.supports_cm else g.residuals(X, plan._step_inputs(), consts)
    )(plan._U)
    # the unknown/array accesses gather f32 VALUES through the index
    # arrays; no int32 gather (re-deriving the index arrays themselves)
    # may remain — sparse(e) over the full domain is the identity
    assert _count_int_gathers(jaxpr.jaxpr) == 0, jaxpr

    # and the identity shortcut must not change results: compare the
    # solve against a dense-jacobian oracle energy evaluation
    c0 = plan.cost()
    r_manual = (inputs["X"][inputs["v0"]] - inputs["X"][inputs["v1"]]
                - (inputs["T"][inputs["v0"]] - inputs["T"][inputs["v1"]]))
    assert np.isclose(c0, 0.5 * np.sum(r_manual ** 2), rtol=1e-5)
    final = plan.solve()
    assert final < 1e-6 * max(c0, 1.0)  # f32 floor (gauge-singular system)
