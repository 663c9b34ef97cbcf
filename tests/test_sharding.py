"""Multi-device sharding tests on the virtual 8-device CPU mesh — the
capability the reference never had (single GPU; SURVEY.md §2.4).  Checks
that sharded solves produce the same answer as single-device solves."""
import numpy as np
import pytest

import jax

from thallo_tpu.models import image_warping
from thallo_tpu.parallel import make_mesh, shard_plan_inputs

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices (CPU mesh)"
)


def _solve(shard, mesh_axes=("x",), dim_axes=None, W=32, H=16):
    spec = image_warping.make_spec()
    plan = spec.plan({"W": W, "H": H}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 6)
    plan.set_solver_parameter("lIterations", 8)
    inputs = image_warping.synthetic_inputs(W, H)
    plan.init(inputs)
    if shard:
        mesh = make_mesh(8 if len(mesh_axes) == 1 else None, axis_names=mesh_axes)
        shard_plan_inputs(plan, mesh, dim_axes=dim_axes)
        with mesh:
            final = plan.solve()
    else:
        final = plan.solve()
    return final, np.asarray(plan.get_unknown("Offset", squeeze=False))


@needs_devices
def test_1d_sharded_solve_matches():
    f0, off0 = _solve(False)
    f1, off1 = _solve(True, ("x",), {"W": "x"})
    assert np.isclose(f0, f1, rtol=1e-3)
    np.testing.assert_allclose(off0, off1, rtol=1e-3, atol=1e-3)


@needs_devices
def test_2d_sharded_solve_matches():
    f0, off0 = _solve(False)
    f1, off1 = _solve(True, ("x", "y"), {"W": "x", "H": "y"})
    assert np.isclose(f0, f1, rtol=1e-3)
    np.testing.assert_allclose(off0, off1, rtol=1e-3, atol=1e-3)


@needs_devices
def test_graph_sharded_solve():
    """Graph energy (ARAP) with replicated edges, sharded vertices."""
    from thallo_tpu.models import arap_mesh_deformation as arap

    side = 8
    N = side * side
    inputs = arap.synthetic_inputs(side=side)
    E = len(inputs["V0"])

    def run(shard):
        spec = arap.make_spec()
        plan = spec.plan({"N": N, "E": E}, solver="levenberg_marquardt")
        plan.set_solver_parameter("nIterations", 5)
        plan.set_solver_parameter("lIterations", 10)
        plan.init(arap.synthetic_inputs(side=side))
        if shard:
            mesh = make_mesh(8, axis_names=("x",))
            shard_plan_inputs(plan, mesh, dim_axes={"N": "x"})
            with mesh:
                return plan.solve()
        return plan.solve()

    f0 = run(False)
    f1 = run(True)
    assert np.isclose(f0, f1, rtol=1e-3)


@needs_devices
def test_graph_edge_sharded_solve():
    """ARAP with the EDGE domain sharded (residual-domain decomposition:
    per-shard partial J^T F / J^T Jp reduced by XLA collectives)."""
    from thallo_tpu.models import arap_mesh_deformation as arap

    side = 8
    N = side * side
    inputs = arap.synthetic_inputs(side=side)
    E = len(inputs["V0"])

    def run(shard):
        spec = arap.make_spec()
        plan = spec.plan({"N": N, "E": E}, solver="levenberg_marquardt")
        plan.set_solver_parameter("nIterations", 5)
        plan.set_solver_parameter("lIterations", 10)
        plan.init(arap.synthetic_inputs(side=side))
        if shard:
            mesh = make_mesh(8, axis_names=("x",))
            shard_plan_inputs(plan, mesh, dim_axes={"E": "x"})
            with mesh:
                return plan.solve()
        return plan.solve()

    f0 = run(False)
    f1 = run(True)
    assert np.isclose(f0, f1, rtol=1e-3)


def test_shard_contraction_energy():
    """Regression: prep trees carry non-array leaves (IndexDomain in
    bdeps/ideps) for contraction-dependent bounds; shard_plan_inputs must
    place only array leaves (it crashed on make_array_from_callback of an
    IndexDomain)."""
    import thallo_tpu as tl

    src = """
N, K = Dims("N", "K")
Inputs(C=Unknown(float, (K,), 0), R=Array(float, (N,), 1), T=Array(float, (N,), 2))
n, k = N(), K()
acc = Sum([k], Select(InBounds(n - k + 1), R(n - k + 1), 0) * C(k))
r = Residuals(conv=T(n) - acc)
"""
    rng = np.random.RandomState(0)
    nN, nK = 16, 3
    spec = tl.load_energy(src)
    plan = spec.plan({"N": nN, "K": nK})
    plan.set_solver_parameter("nIterations", 3)
    ins = {"C": rng.randn(nK).astype(np.float32),
           "R": rng.randn(nN).astype(np.float32),
           "T": rng.randn(nN).astype(np.float32)}
    c0 = plan.init(dict(ins))
    ref_plan = tl.load_energy(src).plan({"N": nN, "K": nK})
    ref_plan.set_solver_parameter("nIterations", 3)
    ref_plan.init(dict(ins))
    ref = ref_plan.solve()

    mesh = make_mesh(8, axis_names=("x",))
    shard_plan_inputs(plan, mesh, dim_axes={"N": "x"})
    with mesh:
        got = plan.solve()
    assert np.isclose(got, ref, rtol=1e-4), (got, ref)
