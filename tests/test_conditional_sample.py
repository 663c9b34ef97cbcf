"""Conditional trilinear/array sampling (reference thallo.t:931-980):
out-of-bounds and -inf-sentinel corners are rejected and the bilinear
weights renormalized — BundleFusion's missing-depth semantics."""
import numpy as np
import jax.numpy as jnp

import thallo_tpu as tl
from thallo_tpu.ops.sampling import conditional_array_sample


def _numpy_oracle(img, x, y, z):
    """Direct transcription of the reference's horizontalConditionalLerp
    + vertical conditional mix (thallo.t:931-980)."""
    W, H, T, C = img.shape
    zi = int(np.clip(round(z), 0, T - 1))
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    ax, by = x - x0, y - y0

    def corner(ix, iy, w):
        if 0 <= ix < W and 0 <= iy < H:
            v = img[ix, iy, zi]
            if v[0] != -np.inf:
                return w * v, w
        return np.zeros(C), 0.0

    def rowp(iy):
        s = np.zeros(C)
        w = 0.0
        for ix, ww in ((x0, 1 - ax), (x0 + 1, ax)):
            sv, sw = corner(ix, iy, ww)
            s, w = s + sv, w + sw
        return (s / w if w > 0 else None)

    p0, p1 = rowp(y0), rowp(y0 + 1)
    ss, ww = np.zeros(C), 0.0
    if p0 is not None:
        ss, ww = ss + (1 - by) * p0, ww + (1 - by)
    if p1 is not None:
        ss, ww = ss + by * p1, ww + by
    return ss / ww if ww > 0 else np.full(C, -np.inf)


def test_conditional_sample_matches_reference_semantics():
    rng = np.random.RandomState(0)
    img = rng.rand(6, 5, 3, 2).astype(np.float32)
    img[2, 3, 1, :] = -np.inf  # invalid pixel (missing depth)
    img[4, 1, 0, :] = -np.inf
    cases = [
        (1.3, 2.6, 1.0),    # one invalid corner: renormalized
        (1.5, 2.5, 1.0),
        (3.4, 0.2, 0.0),    # invalid corner in row 1
        (-0.4, 2.2, 2.0),   # partially out of bounds
        (5.6, 4.7, 2.0),    # corner past the border
        (2.0, 3.0, 1.0),    # exactly ON the invalid pixel: all weight
        #                     there -> rows renormalize to neighbors
        (0.25, 1.75, 0.49),
    ]
    xs = jnp.asarray([c[0] for c in cases], jnp.float32)
    ys = jnp.asarray([c[1] for c in cases], jnp.float32)
    zs = jnp.asarray([c[2] for c in cases], jnp.float32)
    got = np.asarray(conditional_array_sample(jnp.asarray(img), xs, ys, zs))
    for k, (x, y, z) in enumerate(cases):
        want = _numpy_oracle(img, x, y, z)
        if np.isinf(want[0]):
            assert np.isinf(got[k][0]), (k, got[k], want)
        else:
            np.testing.assert_allclose(got[k], want, rtol=1e-5, atol=1e-6,
                                       err_msg=str((k, x, y, z)))


def test_conditional_sample_all_invalid_is_sentinel():
    img = np.full((4, 4, 2, 1), -np.inf, np.float32)
    v = conditional_array_sample(
        jnp.asarray(img), jnp.asarray([1.5]), jnp.asarray([1.5]),
        jnp.asarray([0.0]))
    assert np.isinf(np.asarray(v)[0, 0])


def test_conditional_sampled_energy_solves():
    """SDF-style fit: recover per-point offsets so the conditionally
    sampled volume matches targets; invalid pixels must not poison the
    solve (plain bilinear would propagate -inf into every residual
    whose support touches one)."""
    rng = np.random.RandomState(1)
    W = H = 12
    T = 2
    vol = rng.rand(W, H, T, 1).astype(np.float32)
    vol[5, 5, 0] = -np.inf
    vol[7, 2, 1] = -np.inf
    src = """
N = Dims("N")
Inputs(
    U=Unknown(float2, (N,), 0),
    P=Array(float3, (N,), 1),
    Tgt=Array(float1, (N,), 2),
    Vol=Array(float1, (W, H, T), 3),
)
W, H, T = Dims("W", "H", "T")
n = N()
SV = ConditionalSampledImageArray(Vol)
v = SV(P(n, 0) + U(n, 0), P(n, 1) + U(n, 1), P(n, 2))
r = Residuals(fit=v - Tgt(n), reg=0.1 * U(n))
"""
    # note: Dims may appear in any order; redeclare for the volume dims
    src = src.replace('N = Dims("N")', 'N, W, H, T = Dims("N", "W", "H", "T")')
    src = src.replace('W, H, T = Dims("W", "H", "T")\n', '')
    spec = tl.load_energy(src)
    Nn = 40
    pts = np.stack([
        rng.uniform(1.0, W - 2.5, Nn),
        rng.uniform(1.0, H - 2.5, Nn),
        rng.randint(0, T, Nn).astype(np.float64),
    ], axis=1).astype(np.float32)
    # keep sample support away from the invalid pixels for the TARGETS
    # (so a perfect fit exists) but not for the initial guess
    tgt = []
    for p in pts:
        tgt.append(_numpy_oracle(vol, p[0] + 0.3, p[1] - 0.2, p[2]))
    tgt = np.asarray(tgt, np.float32)
    ok = np.isfinite(tgt[:, 0])
    tgt[~ok] = 0.0
    plan = spec.plan({"N": Nn, "W": W, "H": H, "T": T},
                     solver="levenberg_marquardt")
    plan.set_solver_parameter("lIterations", 25)
    c0 = plan.init({
        "U": np.zeros((Nn, 2), np.float32),
        "P": pts, "Tgt": tgt, "Vol": vol,
    })
    assert np.isfinite(c0)
    for _ in range(8):
        plan.step()
    f = plan.cost()
    assert np.isfinite(f) and f < 0.25 * c0, (c0, f)
