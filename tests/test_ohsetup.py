"""Fused one-hot setup aggregation kernel (ops/ohsetup.py): exactness
vs a float64 oracle, padding/out-of-range handling, eligibility gates,
and the end-to-end solver cross-check in interpreter mode."""
import numpy as np
import pytest

import jax.numpy as jnp

from thallo_tpu.ops.ohsetup import (PRODUCTS_TRACE_COUNT, TRACE_COUNT,
                                    oh_products_eligible,
                                    oh_setup_aggregate,
                                    oh_setup_eligible,
                                    oh_setup_products)


@pytest.mark.parametrize("R", [700, 2048 * 3 + 17])  # non-tile-multiple
@pytest.mark.parametrize("N", [64, 300])
def test_oh_setup_matches_oracle(R, N):
    rng = np.random.default_rng(0)
    F = 13
    parts = rng.normal(size=(F, R)).astype(np.float32) * 100
    ids = rng.integers(0, N, R).astype(np.int32)
    ids[-5:] = N + 2  # out-of-range drops
    out = oh_setup_aggregate(jnp.asarray(parts), jnp.asarray(ids), N=N,
                             interpret=True)
    oracle = np.zeros((F, N), np.float64)
    for r in range(R):
        if ids[r] < N:
            oracle[:, ids[r]] += parts[:, r].astype(np.float64)
    # 3-term bf16 split reproduces f32 summation accuracy
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=2e-6,
                               atol=1e-3 * np.abs(oracle).max())


def test_eligibility():
    f32 = jnp.float32
    assert not oh_setup_eligible(99, 1_000_000, 4096, f32)  # N too big
    assert not oh_setup_eligible(99, 1000, 1024, f32)       # R*N small
    assert not oh_setup_eligible(99, 1_000_000, 1024, jnp.float64)
    assert not oh_setup_eligible(600, 1_000_000, 1024, f32)  # F too big


def test_solver_cross_check(monkeypatch):
    """BA solve with the pallas aggregation (interpret) vs the XLA
    dot_oh_exact path: identical setup numerics -> matching solves."""
    from thallo_tpu.models import bundle_adjustment as ba

    inputs, _ = ba.synthetic_inputs(24, 3000, 6)
    dims = {"C": 24, "P": 3000, "O": len(inputs["oToC"])}
    finals = {}
    for mode in ("0", "interpret"):
        monkeypatch.setenv("THALLO_OH_SETUP", mode)
        # shrink the eligibility floor so the test scene qualifies
        monkeypatch.setattr("thallo_tpu.ops.ohsetup.oh_setup_eligible",
                            lambda F, R, N, dt, _m=mode: _m == "interpret"
                            and jnp.dtype(dt) == jnp.dtype(jnp.float32)
                            and N <= 2048)
        TRACE_COUNT[0] = 0
        PRODUCTS_TRACE_COUNT[0] = 0
        spec = ba.make_spec()
        plan = spec.plan(dims, solver="levenberg_marquardt")
        plan.set_solver_parameter("nIterations", 6)
        c0 = plan.init({k: np.copy(v) for k, v in inputs.items()})
        finals[mode] = plan.solve()
        if mode == "interpret":
            # either fused form counts (the PRODUCTS kernel subsumes the
            # aggregate when the group is jtr/d2/diag-pair shaped)
            assert TRACE_COUNT[0] + PRODUCTS_TRACE_COUNT[0] > 0, \
                "pallas aggregation never traced"
    assert finals["interpret"] < 1e-3 * c0
    assert abs(finals["interpret"] - finals["0"]) <= 1e-5 * max(c0, 1.0)


@pytest.mark.parametrize("R", [777, 2048 + 300])
def test_oh_products_matches_oracle(R):
    """In-kernel jtr/d2/pair slabs + aggregation vs a float64 oracle of
    the XLA form (sum_rc products, then segment-sum by id)."""
    rng = np.random.default_rng(1)
    rc, Ca, Cb, N = 2, 5, 3, 96
    rT = rng.normal(size=(rc, R)).astype(np.float32) * 10
    Ja = rng.normal(size=(rc, Ca, R)).astype(np.float32)
    Jb = rng.normal(size=(rc, Cb, R)).astype(np.float32) * 5
    ids = rng.integers(0, N, R).astype(np.int32)
    ids[:3] = N + 7  # out-of-range drops
    Jall = np.concatenate([Ja.reshape(rc * Ca, R), Jb.reshape(rc * Cb, R)])
    recipe = (("jtr", 0, Ca), ("d2", rc * Ca, Cb),
              ("pair", 0, Ca, rc * Ca, Cb))
    out = oh_setup_products(jnp.asarray(rT), jnp.asarray(Jall),
                            jnp.asarray(ids), N=N, recipe=recipe,
                            interpret=True)
    assert out.shape == (Ca + Cb + Ca * Cb, N)
    J64a, J64b, r64 = Ja.astype(np.float64), Jb.astype(np.float64), rT.astype(np.float64)
    jtr = (J64a * r64[:, None, :]).sum(0)              # [Ca, R]
    d2 = (J64b * J64b).sum(0)                          # [Cb, R]
    eb = np.einsum("kar,kbr->abr", J64a, J64b).reshape(Ca * Cb, R)
    oracle = np.zeros((Ca + Cb + Ca * Cb, N))
    parts = np.concatenate([jtr, d2, eb])
    for r in range(R):
        if ids[r] < N:
            oracle[:, ids[r]] += parts[:, r]
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=3e-5,
                               atol=2e-3 * np.abs(oracle).max())


def test_oh_products_eligibility(monkeypatch):
    monkeypatch.setenv("THALLO_OH_SETUP", "interpret")  # backend-free
    f32 = jnp.float32
    assert oh_products_eligible(99, 18, 1_000_000, 1024, f32)
    assert not oh_products_eligible(99, 500, 1_000_000, 1024, f32)  # K
    assert not oh_products_eligible(400, 18, 1_000_000, 1024, f32)  # F
    assert not oh_products_eligible(99, 18, 1000, 1024, f32)  # R*N small
