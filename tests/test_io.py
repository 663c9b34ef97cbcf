"""BAL file loader round-trip + end-to-end solve from a BAL file (the
reference's bundle_adjustment data flow, examples/bundle_adjustment)."""
import numpy as np

from thallo_tpu.io import bal_to_inputs, load_bal, save_bal
from thallo_tpu.models import bundle_adjustment as ba


def test_bal_roundtrip_and_solve(tmp_path):
    inputs, meta = ba.synthetic_inputs(n_cameras=3, n_points=40, obs_per_point=3)
    path = str(tmp_path / "problem.bal")
    save_bal(path, inputs["cameras"], inputs["points"], inputs["oToC"],
             inputs["oToP"], inputs["observations"])

    cams, pts, ci, pi, obs = load_bal(path)
    np.testing.assert_allclose(cams, inputs["cameras"], rtol=1e-6)
    np.testing.assert_allclose(pts, inputs["points"], rtol=1e-6)
    assert (ci == inputs["oToC"]).all() and (pi == inputs["oToP"]).all()

    loaded, sizes = bal_to_inputs(path)
    assert sizes == {"C": 3, "P": 40, "O": len(ci)}
    spec = ba.make_spec()
    plan = spec.plan(sizes, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 8)
    plan.set_solver_parameter("lIterations", 12)
    c0 = plan.init(loaded)
    final = plan.solve()
    assert final < 0.1 * c0, (c0, final)


def test_bal_gzip(tmp_path):
    inputs, _ = ba.synthetic_inputs(n_cameras=2, n_points=10, obs_per_point=2)
    path = str(tmp_path / "problem.bal.gz")
    save_bal(path, inputs["cameras"], inputs["points"], inputs["oToC"],
             inputs["oToP"], inputs["observations"])
    cams, pts, ci, pi, obs = load_bal(path)
    assert cams.shape == (2, 9) and pts.shape == (10, 3)
