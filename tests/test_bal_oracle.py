"""Committed skewed BAL scene: end-to-end solve + external torch oracle.

The reference's de-facto correctness standard is running Ceres on the
identical data and matching energies (/root/reference/examples/shared/
CombinedSolverBase.h:102-155).  Ceres isn't in this image; torch (CPU)
plays its role: the Snavely energy is written BY HAND in torch (no
thallo_tpu code on the oracle path) and evaluates the committed
power-law-degree BAL file (examples/data/skewed_scene.bal.txt,
Ladybug-49 statistics) at the solver's initial and final unknowns —
pinning both the loaded-data cost semantics and the claimed decrease."""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "examples", "data", "skewed_scene.bal.txt")


def torch_snavely_energy(cams, pts, cam_idx, pt_idx, obs):
    """0.5 * sum of squared Snavely reprojection residuals, f64."""
    cams = torch.tensor(np.asarray(cams, np.float64))
    pts = torch.tensor(np.asarray(pts, np.float64))
    obs = torch.tensor(np.asarray(obs, np.float64))
    c = cams[torch.tensor(np.asarray(cam_idx, np.int64))]
    p = pts[torch.tensor(np.asarray(pt_idx, np.int64))]
    aa, t = c[:, 0:3], c[:, 3:6]
    theta = torch.linalg.norm(aa, dim=1, keepdim=True)
    safe = torch.clamp(theta, min=1e-12)
    w = aa / safe
    ct, st = torch.cos(theta), torch.sin(theta)
    rot = (p * ct + torch.cross(w, p, dim=1) * st
           + w * (w * p).sum(dim=1, keepdim=True) * (1 - ct))
    small = theta[:, 0] <= 1e-12
    if small.any():
        rot[small] = p[small] + torch.cross(aa[small], p[small], dim=1)
    pc = rot + t
    cd = -pc[:, 0:2] / pc[:, 2:3]
    r2 = (cd * cd).sum(dim=1, keepdim=True)
    dist = 1.0 + r2 * (c[:, 7:8] + c[:, 8:9] * r2)
    pred = cd * c[:, 6:7] * dist
    r = obs - pred
    return 0.5 * float((r * r).sum())


def test_skewed_bal_file_solve_matches_torch_oracle():
    from thallo_tpu.io import bal_to_inputs
    from thallo_tpu.models import bundle_adjustment as ba

    inputs, sizes = bal_to_inputs(DATA)
    # degree skew sanity: this file must be power-law, not uniform
    dp = np.bincount(inputs["oToP"], minlength=sizes["P"])
    assert dp.max() >= 4 * max(np.median(dp), 1), "file lost its skew"

    spec = ba.make_spec()
    plan = spec.plan(sizes, solver="levenberg_marquardt")
    plan.set_solver_parameter("lIterations", 12)
    c0 = plan.init({k: np.copy(v) for k, v in inputs.items()})

    # the BSR path must be ACTIVE on the real-statistics file
    bsrs = [c.get("bsr") for c in plan._prep["consts"] if isinstance(c, dict)]
    assert any(b is not None for b in bsrs), \
        "skewed BAL file fell off the block-sparse path"

    # oracle agreement at the initial point (loaded-data semantics):
    # f32 solver evaluation vs f64 torch evaluation of the same energy
    e0 = torch_snavely_energy(inputs["cameras"], inputs["points"],
                              inputs["oToC"], inputs["oToP"],
                              inputs["observations"])
    assert abs(c0 - e0) <= 2e-3 * e0, (c0, e0)

    for _ in range(5):
        plan.step()
    c1 = plan.cost()
    U = plan.unknowns()
    e1 = torch_snavely_energy(np.asarray(U["cameras"]),
                              np.asarray(U["points"]),
                              inputs["oToC"], inputs["oToP"],
                              inputs["observations"])
    # torch confirms the energy of OUR solution...
    assert abs(c1 - e1) <= 5e-3 * max(e1, 1.0), (c1, e1)
    # ...and the solve made real progress on the real-statistics scene
    assert c1 < 0.05 * c0, (c0, c1)
