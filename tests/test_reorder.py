"""Init-time residual-domain sort (thallo_tpu/reorder.py): shuffled
graph/observation domains are relabeled so block-sparse row tables read
contiguous runs.  Pins (a) the relabeling is applied exactly when safe,
(b) results match the unsorted path to float reassociation, (c) the
sorted-run tables actually activate.  Reference analog: the `coherent`
access hint (thallo.t Sparse set_coherent) — sorted edges are a
performance contract there too, but user-supplied."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from thallo_tpu import lib_env
from thallo_tpu.models import bundle_adjustment as ba


def _ba_plan(inputs, sizes, sort):
    os.environ["THALLO_SORT_RESIDUALS"] = "1" if sort else "0"
    try:
        spec = ba.make_spec()
        for nr in spec.energy:
            nr.JtJ.set_sparse(True)  # force BSR below the dense threshold
        plan = spec.plan(sizes, solver="levenberg_marquardt")
        plan.set_solver_parameter("lIterations", 6)
        plan.init(inputs)
        return plan
    finally:
        os.environ.pop("THALLO_SORT_RESIDUALS", None)


def _bsr_tables(plan):
    bsrs = [c.get("bsr") for c in plan._prep["consts"] if isinstance(c, dict)]
    return [b for b in bsrs if b is not None]


def test_skewed_ba_sorts_and_matches():
    inputs, _ = ba.skewed_inputs(16, 600, 3000)
    sizes = {"C": 16, "P": 600, "O": len(inputs["oToC"])}
    ps = _ba_plan(inputs, sizes, sort=True)
    pu = _ba_plan(inputs, sizes, sort=False)
    assert list(ps._residual_perms) == ["O"]
    assert not pu._residual_perms
    # sorted-run tables active on the sorted plan only
    assert any(s is not None for b in _bsr_tables(ps) for s in b.row_starts)
    assert all(s is None for b in _bsr_tables(pu) for s in b.row_starts)
    # identical initial cost (same residual multiset)
    np.testing.assert_allclose(ps._initial_cost, pu._initial_cost, rtol=1e-6)
    # one LM step lands within float-reassociation distance
    ps.step()
    pu.step()
    np.testing.assert_allclose(ps.cost(), pu.cost(), rtol=1e-3)


def test_update_inputs_arrives_in_user_order():
    inputs, _ = ba.skewed_inputs(16, 600, 3000)
    sizes = {"C": 16, "P": 600, "O": len(inputs["oToC"])}
    ps = _ba_plan(inputs, sizes, sort=True)
    pu = _ba_plan(inputs, sizes, sort=False)
    new_obs = np.asarray(inputs["observations"]) * 1.5
    ps.update_inputs({"observations": new_obs})
    pu.update_inputs({"observations": new_obs})
    assert ps._residual_perms  # still sorted after the update
    np.testing.assert_allclose(float(ps.cost()), float(pu.cost()), rtol=1e-5)


def test_presorted_input_needs_no_perm():
    inputs, _ = ba.synthetic_inputs(8, 256, 3)  # generated point-sorted
    sizes = {"C": 8, "P": 256, "O": len(inputs["oToC"])}
    plan = _ba_plan(inputs, sizes, sort=True)
    assert not plan._residual_perms


def test_stencil_access_blocks_sort():
    # an offset access over the graph dim makes the order observable
    src = """
N, E = Dims("N", "E")
Inputs(
    X=Unknown(float1, (N,), 0),
    w=Array(float1, (E,), 1),
    v0=Sparse((E,), (N,), 2),
)
e = E()
r = Residuals(chain=w(e) - w(e + 1) + X(v0(e)))
"""
    spec = lib_env.load_energy(src, filename="stencil_over_E.py")
    for nr in spec.energy:
        nr.JtJ.set_sparse(True)
    rng = np.random.RandomState(0)
    N, E = 64, 512
    plan = spec.plan({"N": N, "E": E}, solver="gauss_newton")
    inputs = {"X": rng.randn(N, 1).astype(np.float32),
              "w": rng.randn(E, 1).astype(np.float32),
              "v0": rng.randint(0, N, size=E).astype(np.int32)}
    plan.init(inputs)
    assert not plan._residual_perms  # offset access over E: unsafe


def test_index_value_blocks_sort():
    src = """
N, E = Dims("N", "E")
Inputs(
    X=Unknown(float1, (N,), 0),
    v0=Sparse((E,), (N,), 1),
)
e = E()
r = Residuals(pos=X(v0(e)) - 0.01 * e.asvalue())
"""
    spec = lib_env.load_energy(src, filename="ival_over_E.py")
    for nr in spec.energy:
        nr.JtJ.set_sparse(True)
    rng = np.random.RandomState(0)
    N, E = 64, 512
    plan = spec.plan({"N": N, "E": E}, solver="gauss_newton")
    inputs = {"X": rng.randn(N, 1).astype(np.float32),
              "v0": rng.randint(0, N, size=E).astype(np.int32)}
    plan.init(inputs)
    assert not plan._residual_perms  # e.asvalue() reads the label


def test_arap_shuffled_edges_sort_and_match():
    from thallo_tpu.models import arap_mesh_deformation as arap

    side = 40  # 1600 verts x 6 channels: above the dense-JtJ threshold
    ai = arap.synthetic_inputs(side=side)
    ai = arap.shuffle_edges(ai)
    E = len(ai["V0"])
    spec = arap.make_spec()
    os.environ["THALLO_SORT_RESIDUALS"] = "1"
    try:
        plan = spec.plan({"N": side * side, "E": E}, solver="gauss_newton")
        plan.set_solver_parameter("lIterations", 8)
        c0 = plan.init(ai)
    finally:
        os.environ.pop("THALLO_SORT_RESIDUALS", None)
    assert list(plan._residual_perms) == ["E"]
    plan.run_steps(3)
    c = float(plan.cost())
    # reference trajectory: unshuffled grid edges (the canonical order)
    plan2 = arap.make_spec().plan({"N": side * side, "E": E},
                                  solver="gauss_newton")
    plan2.set_solver_parameter("lIterations", 8)
    c0g = plan2.init(arap.synthetic_inputs(side=side))
    plan2.run_steps(3)
    np.testing.assert_allclose(c0, c0g, rtol=1e-5)
    np.testing.assert_allclose(c, float(plan2.cost()), rtol=1e-3)
