"""Guard against the TPU default-matmul-precision trap (PERF.md).

XLA's DEFAULT matmul precision rounds f32 dot operands to bf16 on TPU
(one MXU pass); CPU executes full f32 regardless, so no numeric test on
the CPU backend can catch a dot that silently degrades on hardware.
Measured on v5e: a default-precision one-hot setup aggregation stalled
BA's LM at cost 1258 where the exact contraction reaches 0.005 (250x).

This test enforces the structural rule instead: every dot_general on
the solve path whose operands are BOTH float32/float64 must carry an
explicit precision.  Deliberately-approximate dots are exempt by
construction — they run with bf16 operands (solver/blocksparse.py
_routed), which this walker skips.
"""
import jax
import jax.extend  # noqa: F401  (jax.extend.core.ClosedJaxpr below)
import numpy as np
import pytest

from thallo_tpu.models import bundle_adjustment as ba
from thallo_tpu.models import image_warping


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


def _walk(jaxpr, bad, seen, path=""):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            seen.append(path)
            prec = eqn.params.get("precision")
            dts = {np.dtype(v.aval.dtype) for v in eqn.invars
                   if hasattr(v, "aval") and hasattr(v.aval, "dtype")}
            wide = {np.dtype("float32"), np.dtype("float64")}
            if dts and dts <= wide and prec is None:
                bad.append((path, str(eqn)[:160]))
        for sub in _subjaxprs(eqn):
            _walk(sub, bad, seen, path + "/" + eqn.primitive.name)


def _assert_no_default_f32_dots(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    bad, seen = [], []
    _walk(jaxpr.jaxpr, bad, seen)
    assert seen, "walker found no dot_general at all — guard is vacuous"
    assert not bad, (
        "f32 dot_general without explicit precision on the solve path "
        "(silently bf16 on TPU — see PERF.md 'the default-precision "
        f"trap'): {bad[:4]}")


@pytest.mark.parametrize("scale", ["small"])
def test_ba_step_has_no_default_precision_f32_dots(scale):
    inputs, _ = ba.synthetic_inputs(n_cameras=8, n_points=128,
                                    obs_per_point=4)
    O = len(inputs["oToC"])
    spec = ba.make_spec()
    plan = spec.plan({"C": 8, "P": 128, "O": O},
                     solver="levenberg_marquardt")
    plan.init(inputs)
    comp = plan.compiled
    args = (plan._U, plan._lm, plan._step_inputs(), plan._sp(), plan._prep)
    _assert_no_default_f32_dots(comp.nonlinear_step, *args)


def test_image_warping_step_has_no_default_precision_f32_dots():
    spec = image_warping.make_spec()
    plan = spec.plan({"W": 32, "H": 32}, solver="gauss_newton")
    inputs = image_warping.synthetic_inputs(32, 32)
    plan.init(inputs)
    comp = plan.compiled
    args = (plan._U, plan._lm, plan._step_inputs(), plan._sp(), plan._prep)
    _assert_no_default_f32_dots(comp.nonlinear_step, *args)
