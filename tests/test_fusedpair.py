"""Fused cross-pair pallas kernel (ops/fusedpair.py): unit equivalence vs
a dense reference, padding/out-of-range handling, and the end-to-end
solver cross-check (fused vs XLA routing path) in interpreter mode."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from thallo_tpu.ops.fusedpair import fused_pair_apply, fused_pair_eligible


def _reference(ids, blocks_wm, pcol, prow, Ci, Cj, S):
    """Dense einsum oracle with the kernel's numerics contract (bf16
    value rounding on the routing operands, f32 accumulate)."""
    W, N = ids.shape
    b = np.asarray(blocks_wm, np.float32).reshape(W, Ci, Cj, N)
    oh = (np.asarray(ids)[None, :, :] == np.arange(S)[:, None, None])
    pc_b = np.asarray(np.asarray(pcol).astype(jnp.bfloat16), np.float32)
    pc = np.einsum("js,swn->jwn", pc_b, oh.astype(np.float32))
    rows = np.einsum("wijn,jwn->in", b, pc)
    z = np.einsum("wijn,in->jwn", b, np.asarray(prow, np.float32))
    z_b = np.asarray(np.asarray(z).astype(jnp.bfloat16), np.float32)
    cols = np.einsum("jwn,swn->js", z_b, oh.astype(np.float32))
    return rows, cols


@pytest.mark.parametrize("N", [384, 1000])  # 1000: non-128-multiple tail
@pytest.mark.parametrize("W", [1, 3, 12])   # 12: the W>8 2-D-grid kernel
# 64: direct one-hot; 500: two-digit decomposition with a non-128-
# multiple S (padding columns in [S, H*L) must drop)
@pytest.mark.parametrize("S", [64, 500])
def test_fused_pair_matches_dense(N, W, S):
    rng = np.random.default_rng(0)
    Ci, Cj = 3, 5
    ids = rng.integers(0, S, (W, N)).astype(np.int32)
    ids[:, -7:] = S + 3  # out-of-range tail must drop silently
    blocks = rng.normal(size=(W * Ci * Cj, N)).astype(np.float32)
    pcol = rng.normal(size=(Cj, S)).astype(np.float32)
    prow = rng.normal(size=(Ci, N)).astype(np.float32)
    rows, cols = fused_pair_apply(
        jnp.asarray(ids), jnp.asarray(blocks), jnp.asarray(pcol),
        jnp.asarray(prow), Ci=Ci, Cj=Cj, S=S, interpret=True)
    r_ref, c_ref = _reference(ids, blocks, pcol, prow, Ci, Cj, S)
    np.testing.assert_allclose(np.asarray(rows), r_ref, rtol=2e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(cols), c_ref, rtol=2e-2, atol=1e-2)


def test_eligibility_gates(monkeypatch):
    assert not fused_pair_eligible(4096 + 1, 4, 1000, jnp.float32)
    assert not fused_pair_eligible(256, 4, 1000, jnp.float64)
    assert not fused_pair_eligible(64, 2, 1000, jnp.float32)  # tiny level
    monkeypatch.setenv("THALLO_FUSED_PAIR", "0")
    assert not fused_pair_eligible(256, 4, 10_000, jnp.float32)
    monkeypatch.setenv("THALLO_FUSED_PAIR", "interpret")
    assert fused_pair_eligible(256, 4, 10_000, jnp.bfloat16)
    assert fused_pair_eligible(1024, 716, 325, jnp.float32)  # skew tail
    # huge Ci*Cj: even the W-independent 2-D-grid tile misses the VMEM
    # budget — must stay on the XLA path (advisor r4)
    assert not fused_pair_eligible(2048, 4, 10_000, jnp.float32,
                                   Ci=32, Cj=32)


def test_setup_records_layout(monkeypatch):
    """The fused set is decided at setup and RECORDED on BsrBlocks;
    bsr_apply reads it from there, so flipping THALLO_FUSED_PAIR between
    setup and apply cannot reinterpret the stored layout (advisor r4).
    Mesh mode records an empty fused set (the pallas kernel does not
    partition under GSPMD)."""
    from thallo_tpu.models import bundle_adjustment as ba
    from thallo_tpu.solver.blocksparse import (
        BsrBlocks, build_group_bsr, fused_pair_cols)

    inputs, _ = ba.skewed_inputs(96, 4000, 24_000)
    spec = ba.make_spec()
    dims = {"C": 96, "P": 4000, "O": len(inputs["oToC"])}
    monkeypatch.setenv("THALLO_FUSED_PAIR", "interpret")
    plan = spec.plan(dims, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 1)
    plan.init(inputs)
    bsr = next(c["bsr"] for c in plan._prep["consts"]
               if isinstance(c, dict) and c.get("bsr") is not None)
    fused = fused_pair_cols(bsr, jnp.float32)
    assert fused, "scene too small to exercise the fused path"
    assert fused_pair_cols(bsr, jnp.float32, mesh=True) == {}
    # run one real setup phase, grab the recorded layout from the state
    solver = plan.compiled
    state = jax.jit(solver.solve_setup)(
        plan._U, plan._lm, plan._step_inputs(), plan._sp(), plan._prep)
    entry = next(v for v in state["jac_store"].values() if "bsr" in v)
    blocks = entry["bsr"]
    assert isinstance(blocks, BsrBlocks)
    assert dict(blocks.fused) == fused
    # flipping the env after setup must not change what apply reads
    monkeypatch.setenv("THALLO_FUSED_PAIR", "0")
    assert blocks.fused_map() == fused


def test_solver_cross_check_fused_vs_xla():
    """BA-style skewed solve: fused (interpret) vs XLA routing path must
    agree on the final cost and unknowns."""
    from thallo_tpu.models import bundle_adjustment as ba

    inputs, _ = ba.skewed_inputs(96, 4000, 24_000)
    spec = ba.make_spec()
    dims = {"C": 96, "P": 4000, "O": len(inputs["oToC"])}

    from thallo_tpu.ops import fusedpair

    finals = {}
    unks = {}
    c0s = {}
    for mode in ("0", "interpret"):
        os.environ["THALLO_FUSED_PAIR"] = mode
        fusedpair.TRACE_COUNT[0] = 0
        try:
            plan = spec.plan(dims, solver="levenberg_marquardt")
            plan.set_solver_parameter("nIterations", 6)
            c0s[mode] = plan.init(inputs)
            finals[mode] = plan.solve()
            unks[mode] = np.asarray(plan.get_unknown("cameras"))
        finally:
            os.environ.pop("THALLO_FUSED_PAIR", None)
        if mode == "interpret":
            assert fusedpair.TRACE_COUNT[0] > 0, \
                "fused pallas path never traced — test exercises nothing"
        else:
            assert fusedpair.TRACE_COUNT[0] == 0
    # both paths round routing operands to bf16, but in different
    # groupings — near the optimum (5 orders below the initial cost) the
    # absolute finals drift with rounding, so compare relative to the
    # INITIAL cost.  Kernel-level equivalence is pinned by
    # test_fused_pair_matches_dense.
    c0 = c0s["0"]
    assert finals["0"] < 1e-3 * c0 and finals["interpret"] < 1e-3 * c0
    assert abs(finals["interpret"] - finals["0"]) < 1e-4 * c0
    np.testing.assert_allclose(unks["interpret"], unks["0"],
                               rtol=0.2, atol=0.1)
