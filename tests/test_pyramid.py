"""Coarse-to-fine pyramid solving (utils/pyramid.py): the reference's
optical-flow-class downsample hierarchy (examples/optical_flow
--downsampleFactor) as a first-class helper."""
import numpy as np

from thallo_tpu.models import optical_flow
from thallo_tpu.utils.pyramid import (
    downsample2,
    solve_coarse_to_fine,
    upsample2,
)


def test_down_up_sample():
    a = np.arange(64, dtype=np.float32).reshape(8, 8)
    d = downsample2(a, 2)
    assert d.shape == (4, 4)
    np.testing.assert_allclose(d[0, 0], a[:2, :2].mean())
    u = upsample2(d, (8, 8), 2)
    assert u.shape == (8, 8)
    # bilinear upsample preserves the mean-ish ramp
    assert abs(u.mean() - d.mean()) < 1e-5


def test_pyramid_recovers_large_flow():
    """A 3-pixel shift is outside the bilinear basin from a zero init at
    full resolution; the pyramid recovers it (the reference solves this
    with its downsample hierarchy)."""
    W = H = 32
    shift = (3.0, -2.0)
    inputs, meta = optical_flow.synthetic_inputs(W, H, shift=shift, w_reg=0.1)

    def regrade(key):
        # re-derive the gradient images from the pooled I_hat instead of
        # pooling the full-res gradients (keeps image/gradient consistent
        # per level)
        def f(arr, target):
            ih = inputs["I_hat_im"]
            a = ih
            from thallo_tpu.utils.pyramid import _crop_axes, _pool_axes
            while a.shape[0] > target[0] * 2 - 1:
                a = _pool_axes(a, [0, 1])
            a = _crop_axes(a, [0, 1], list(target))
            if key == "im":
                return a.astype(np.float32)
            ax = 0 if key == "dx" else 1
            g = 0.5 * (np.roll(a, -1, ax) - np.roll(a, 1, ax))
            return g.astype(np.float32)
        return f

    plan, history = solve_coarse_to_fine(
        optical_flow.make_spec,
        inputs,
        {"W": W, "H": H},
        scaled_dims=("W", "H"),
        levels=3,
        pixel_valued=("X",),
        solver="gauss_newton",
        nonlinear_iters=16,
        linear_iters=16,
        input_downsample={
            "I_hat_im": regrade("im"),
            "I_hat_dx": regrade("dx"),
            "I_hat_dy": regrade("dy"),
        },
    )
    assert len(history) == 3
    assert history[-1]["sizes"] == {"W": W, "H": H}
    flow = np.asarray(plan.get_unknown("X"))
    interior = flow[8:-8, 8:-8]
    med = np.median(interior.reshape(-1, 2), axis=0)
    np.testing.assert_allclose(med, shift, atol=0.2)

    # single-level solve from zero init must do clearly worse on the same
    # budget (this is the point of the pyramid)
    spec = optical_flow.make_spec()
    p1 = spec.plan({"W": W, "H": H}, solver="gauss_newton")
    p1.set_solver_parameter("nIterations", 18)
    p1.set_solver_parameter("lIterations", 12)
    p1.init(inputs)
    p1.solve()
    f1 = np.asarray(p1.get_unknown("X"))
    med1 = np.median(f1[8:-8, 8:-8].reshape(-1, 2), axis=0)
    err_pyr = np.abs(med - shift).max()
    err_flat = np.abs(med1 - shift).max()
    assert err_pyr < err_flat * 0.5, (err_pyr, err_flat)
