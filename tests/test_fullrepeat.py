"""Fused full-repeat setup kernel (ops/fullrepeat.py): exactness vs a
float64 oracle of the XLA channel-major path, w-major cross layout, and
the end-to-end solver cross-check in interpreter mode."""
import numpy as np
import pytest

import jax.numpy as jnp

from thallo_tpu.ops.fullrepeat import (TRACE_COUNT, fullrepeat_eligible,
                                       fullrepeat_setup)


@pytest.mark.parametrize("N_t,W", [(500, 4), (130, 3)])
def test_fullrepeat_matches_oracle(N_t, W):
    rng = np.random.default_rng(2)
    rc, Ca, Cb = 2, 4, 3
    R = N_t * W
    rT = rng.normal(size=(rc, R)).astype(np.float32) * 10
    Ja = rng.normal(size=(rc, Ca, R)).astype(np.float32)
    Jb = rng.normal(size=(rc, Cb, R)).astype(np.float32) * 3
    Jall = np.concatenate([Ja.reshape(rc * Ca, R), Jb.reshape(rc * Cb, R)])
    recipe = (("jtr", rc * Ca, Cb),          # point jtr
              ("d2", rc * Ca, Cb),           # point d2
              ("diag", rc * Ca, Cb, rc * Ca, Cb),   # point diag block
              ("cross", 0, Ca, rc * Ca, Cb, 0))     # cam x point, w-major
    agg, crosses = fullrepeat_setup(
        jnp.asarray(rT), jnp.asarray(Jall), W=W, N_t=N_t,
        recipe=recipe, interpret=True)
    assert agg.shape == (Cb + Cb + Cb * Cb, N_t)
    assert crosses[0].shape == (W * Ca * Cb, N_t)
    J64a = Ja.astype(np.float64).reshape(rc, Ca, N_t, W)
    J64b = Jb.astype(np.float64).reshape(rc, Cb, N_t, W)
    r64 = rT.astype(np.float64).reshape(rc, N_t, W)
    jtr = (J64b * r64[:, None]).sum((0, 3))            # [Cb, N_t]
    d2 = (J64b ** 2).sum((0, 3))
    diag = np.einsum("kanw,kbnw->abn", J64b, J64b).reshape(Cb * Cb, N_t)
    cross = np.einsum("kanw,kbnw->wabn", J64a, J64b).reshape(
        W * Ca * Cb, N_t)
    oracle = np.concatenate([jtr, d2, diag])
    np.testing.assert_allclose(np.asarray(agg), oracle, rtol=3e-5,
                               atol=2e-4 * np.abs(oracle).max())
    np.testing.assert_allclose(np.asarray(crosses[0]), cross, rtol=3e-5,
                               atol=2e-4 * np.abs(cross).max())


def test_fullrepeat_eligibility(monkeypatch):
    monkeypatch.setenv("THALLO_FR_SETUP", "interpret")
    f32 = jnp.float32
    assert fullrepeat_eligible(4, 2_000_000, 24, 2, f32)
    assert not fullrepeat_eligible(12, 2_000_000, 24, 2, f32)  # W
    assert not fullrepeat_eligible(4, 1000, 24, 2, f32)        # small
    assert not fullrepeat_eligible(4, 2_000_000, 24, 2, jnp.float64)
    monkeypatch.setenv("THALLO_FR_SETUP", "0")
    assert not fullrepeat_eligible(4, 2_000_000, 24, 2, f32)


def test_solver_cross_check(monkeypatch):
    """Uniform-BA solve with the fused full-repeat setup (interpret) vs
    the XLA channel-major path: matching solves."""
    from thallo_tpu.models import bundle_adjustment as ba
    from thallo_tpu.ops import fullrepeat

    inputs, _ = ba.synthetic_inputs(16, 2048, 4)  # sorted uniform oToP
    dims = {"C": 16, "P": 2048, "O": len(inputs["oToC"])}
    finals = {}
    for mode in ("0", "interpret"):
        monkeypatch.setenv("THALLO_FR_SETUP", mode)
        # the fused-setup path only engages for col pairs in the fused
        # pallas set (it emits their w-major layout), so force the pair
        # kernel on (interpret, size floor waived) for both sides
        monkeypatch.setenv("THALLO_FUSED_PAIR", "interpret")
        from thallo_tpu.ops import fusedpair

        monkeypatch.setattr(
            fusedpair, "fused_pair_eligible",
            lambda S, W, N, dt, Ci=1, Cj=1: jnp.dtype(dt) in
            (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)))
        # shrink the size floor so the test scene qualifies
        monkeypatch.setattr(
            fullrepeat, "fullrepeat_eligible",
            lambda W, N, K, rc, dt, _m=mode: _m == "interpret"
            and jnp.dtype(dt) == jnp.dtype(jnp.float32) and W <= 8)
        TRACE_COUNT[0] = 0
        spec = ba.make_spec()
        plan = spec.plan(dims, solver="levenberg_marquardt")
        plan.set_solver_parameter("nIterations", 6)
        c0 = plan.init({k: np.copy(v) for k, v in inputs.items()})
        finals[mode] = plan.solve()
        if mode == "interpret":
            assert TRACE_COUNT[0] > 0, "fullrepeat kernel never traced"
    assert finals["interpret"] < 1e-2 * c0
    assert abs(finals["interpret"] - finals["0"]) <= 1e-5 * max(c0, 1.0)
