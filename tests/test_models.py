"""End-to-end solves of the ported model energies (the reference's
examples: image_warping, poisson_image_editing, arap_mesh_deformation,
bundle_adjustment) on synthetic data.  The correctness bar mirrors the
reference's Ceres-comparison harness: the energy must drop by orders of
magnitude and recover ground truth where one exists."""
import numpy as np

from thallo_tpu.models import (
    arap_mesh_deformation,
    bundle_adjustment,
    image_warping,
    poisson_image_editing,
)


def test_image_warping_converges():
    spec = image_warping.make_spec()
    plan = spec.plan({"W": 32, "H": 32}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 15)
    plan.set_solver_parameter("lIterations", 20)
    inputs = image_warping.synthetic_inputs(32, 32)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert final < 0.1 * c0
    # constrained points moved towards their targets
    off = np.asarray(plan.get_unknown("Offset", squeeze=False))
    cons = inputs["Constraints"]
    sel = cons[..., 0] >= 0
    err0 = np.abs(inputs["Offset"][sel] - cons[sel]).mean()
    err1 = np.abs(off[sel] - cons[sel]).mean()
    assert err1 < 0.5 * err0


def test_poisson_image_editing():
    spec = poisson_image_editing.make_spec()
    plan = spec.plan({"W": 32, "H": 32}, solver="gauss_newton")
    plan.set_solver_parameter("nIterations", 3)
    plan.set_solver_parameter("lIterations", 60)
    inputs = poisson_image_editing.synthetic_inputs(32, 32)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert final < 0.05 * c0
    # excluded boundary pixels (M != 0) must be untouched
    X = np.asarray(plan.get_unknown("X", squeeze=False))
    M = inputs["M"]
    np.testing.assert_array_equal(X[M != 0], inputs["X"][M != 0])
    assert np.abs(X[M == 0] - inputs["X"][M == 0]).max() > 1e-3


def test_arap_mesh_deformation():
    spec = arap_mesh_deformation.make_spec()
    inputs = arap_mesh_deformation.synthetic_inputs(side=8)
    N = 8 * 8
    E = len(inputs["V0"])
    plan = spec.plan({"N": N, "E": E}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 20)
    plan.set_solver_parameter("lIterations", 30)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert final < 0.1 * c0
    pos = np.asarray(plan.get_unknown("Position", squeeze=False))
    corner = N - 1
    target = inputs["Constraints"][corner]
    assert np.linalg.norm(pos[corner] - target) < 1.0


def test_bundle_adjustment():
    spec = bundle_adjustment.make_spec()
    inputs, meta = bundle_adjustment.synthetic_inputs(n_cameras=3, n_points=32)
    O = len(inputs["oToC"])
    plan = spec.plan({"C": 3, "P": 32, "O": O}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 25)
    plan.set_solver_parameter("lIterations", 40)
    c0 = plan.init(inputs)
    final = plan.solve()
    # perturbed init must come back to near the (noisy) ground truth
    assert final < 1e-2 * c0
