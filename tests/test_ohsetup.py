"""Fused one-hot setup aggregation kernel (ops/ohsetup.py): exactness
vs a float64 oracle, padding/out-of-range handling, eligibility gates,
and the end-to-end solver cross-check in interpreter mode."""
import numpy as np
import pytest

import jax.numpy as jnp

from thallo_tpu.ops.ohsetup import (TRACE_COUNT, oh_setup_aggregate,
                                    oh_setup_eligible)


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
        spec = ba.make_spec()
        plan = spec.plan(dims, solver="levenberg_marquardt")
        plan.set_solver_parameter("nIterations", 6)
        c0 = plan.init({k: np.copy(v) for k, v in inputs.items()})
        finals[mode] = plan.solve()
        if mode == "interpret":
            assert TRACE_COUNT[0] > 0, "pallas aggregation never traced"
    assert finals["interpret"] < 1e-3 * c0
    assert abs(finals["interpret"] - finals["0"]) <= 1e-5 * max(c0, 1.0)
