"""Primitive-level unit tests — the analog of the reference's CUDA
warp-primitive tests (tests/cuda_unit_tests/: ballot/get_peers/
reduce_peers assert warp reduction machinery).  Here the machinery is
roll-gather/inverse-roll-scatter, segment scatter, the tiled segment sum,
and the compile-only harness."""
import numpy as np
import jax
import jax.numpy as jnp

import thallo_tpu as tl
from thallo_tpu.ops.segsum import build_plan, pallas_segment_sum, tiled_segment_sum


def _laplacian_group(n=8):
    spec = tl.load_energy(
        """
W, H = Dims("W", "H")
Inputs(X=Unknown(float2, (W, H), 0), A=Array(float2, (W, H), 1))
x, y = W(), H()
r = Residuals(reg=X(x + 1, y - 2) - A(x, y))
"""
    )
    plan = spec.plan({"W": n, "H": n})
    return plan.compiled.groups[0].group


def test_roll_gather_scatter_adjoint():
    """<gather(x), y> == <x, scatter(y)> for the roll fast path."""
    g = _laplacian_group(8)
    rng = np.random.RandomState(0)
    X = {"X": jnp.asarray(rng.randn(8, 8, 2).astype(np.float32))}
    y = jnp.asarray(rng.randn(g.R, 2).astype(np.float32))
    gx = g.gather_slot(0, X, {})
    sy = g.scatter_slot(0, y, {})
    lhs = float(jnp.vdot(gx, y))
    rhs = float(jnp.vdot(X["X"], sy))
    assert np.isclose(lhs, rhs, rtol=1e-5)


def test_roll_gather_wraps():
    """Gather of X(x+1, y-2) equals jnp.roll semantics (torus)."""
    g = _laplacian_group(8)
    rng = np.random.RandomState(1)
    Xv = rng.randn(8, 8, 2).astype(np.float32)
    out = np.asarray(g.gather_slot(0, {"X": jnp.asarray(Xv)}, {})).reshape(8, 8, 2)
    expected = np.roll(np.roll(Xv, -1, axis=0), 2, axis=1)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_tiled_segment_sum_matches_xla():
    rng = np.random.RandomState(2)
    for M, S in [(1000, 257), (5000, 64), (128, 4096)]:
        ids = rng.randint(0, S, size=M).astype(np.int32)
        data = rng.randn(M, 3).astype(np.float32)
        plan = build_plan(ids, S)
        want = np.asarray(jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(ids), num_segments=S))
        got_e = np.asarray(tiled_segment_sum(jnp.asarray(data), plan))
        got_p = np.asarray(pallas_segment_sum(jnp.asarray(data), plan))
        np.testing.assert_allclose(got_e, want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got_p, want, rtol=1e-4, atol=1e-5)


def test_tiled_plan_rejects_degenerate():
    # all rows into one segment: padding waste explodes -> fallback
    ids = np.zeros(100000, np.int32)
    assert build_plan(ids, 100000) is None


def test_compile_check_harness(tmp_path):
    """The compile-only energy harness (reference energy_unit_tests/
    compile.t)."""
    from thallo_tpu.utils.compile_check import compile_check

    p = tmp_path / "energy.py"
    p.write_text(
        """
W, H = Dims("W", "H")
Inputs(X=Unknown(float, (W, H), 0), A=Array(float, (W, H), 1))
x, y = W(), H()
r = Residuals(fit=X(x, y) - A(x, y))
"""
    )
    plan = compile_check(str(p), default_dim=16)
    assert len(plan.compiled.groups) == 1


def test_bilinear_sample_interior():
    from thallo_tpu.ops.sampling import bilinear_sample

    img = jnp.arange(16.0).reshape(4, 4, 1)
    # exact lattice points
    v = bilinear_sample(img, jnp.asarray([1.0]), jnp.asarray([2.0]))
    assert np.isclose(float(v[0, 0]), 6.0)
    # midpoint
    v = bilinear_sample(img, jnp.asarray([1.5]), jnp.asarray([2.0]))
    assert np.isclose(float(v[0, 0]), 8.0)


def test_array_sample_slices():
    from thallo_tpu.ops.sampling import array_bilinear_sample

    img = jnp.stack([jnp.full((4, 4, 1), float(t)) for t in range(3)], axis=2)  # [4,4,3,1]
    v = array_bilinear_sample(img, jnp.asarray([1.2]), jnp.asarray([2.2]), jnp.asarray([1.0]))
    assert np.isclose(float(v[0, 0]), 1.0)


def test_jacobian_export_matches_dense():
    spec = tl.load_energy(
        """
W, H = Dims("W", "H")
Inputs(X=Unknown(float, (W, H), 0), A=Array(float, (W, H), 1))
x, y = W(), H()
r = Residuals(fit=0.4 * (X(x, y) - A(x, y)),
              reg=Select(InBounds(x + 1, y), X(x, y) - X(x + 1, y), 0))
"""
    )
    rng = np.random.RandomState(3)
    t = rng.rand(6, 6).astype(np.float32)
    plan = spec.plan({"W": 6, "H": 6})
    plan.init({"X": (t * 0.7).copy(), "A": t})
    r_d, J_d = plan.jacobian(dense=True)
    r_c, rows, cols, vals, shape = plan.jacobian(dense=False)
    np.testing.assert_allclose(np.asarray(r_d), np.asarray(r_c))
    dense_from_coo = np.zeros(shape, np.float32)
    np.add.at(dense_from_coo, (np.asarray(rows), np.asarray(cols)), np.asarray(vals))
    np.testing.assert_allclose(np.asarray(J_d), dense_from_coo, rtol=1e-5, atol=1e-6)


def test_inverse_matrix4():
    src = """
W = Dims("W")
Inputs(M=Array(float16, (W,), 0), X=Unknown(float, (W,), 1))
w = W()
Minv = InverseMatrix4(M(w))
# residual: (M @ Minv - I) entries must be ~0 regardless of X; X just
# gives the problem an unknown
ident = matmul(M(w), Minv)
r = Residuals(
    fit=X(w),
    check=[ident(0) - 1, ident(5) - 1, ident(10) - 1, ident(15) - 1,
           ident(1), ident(2), ident(4), ident(6)],
)
"""
    spec = tl.load_energy(src)
    rng = np.random.RandomState(4)
    M = (np.eye(4) + 0.2 * rng.randn(4, 4)).astype(np.float32).reshape(1, 16)
    plan = spec.plan({"W": 1})
    c0 = plan.init({"M": M, "X": np.ones(1, np.float32)})
    # the 'check' residuals contribute ~0 to the cost: cost ~= 0.5*X^2
    assert np.isclose(c0, 0.5, atol=1e-3)


def test_point_jacobians_cm_matches_row_major():
    """The channel-major graph pipeline (gather_slot_cm /
    point_jacobians_cm, used by the block-sparse setup) must produce
    exactly the row-major jacobians, in both AD modes."""
    import os

    src = """
N, E = Dims("N", "E")
Inputs(
    P=Unknown(float3, (N,), 0),
    A=Array(float3, (N,), 1),
    v0=Sparse((E,), (N,), 2),
    v1=Sparse((E,), (N,), 3),
)
e = E()
d = P(v0(e)) - P(v1(e))
t = A(v0(e)) - A(v1(e))
r = Residuals(edge=[dot(d, d) - dot(t, t), d(0) * d(1)])
"""
    # second energy: TWO unknowns sharing the v0 index (exercises the
    # shared-gather dedup in gather_all_cm)
    src2 = """
N, E = Dims("N", "E")
Inputs(
    P=Unknown(float3, (N,), 0),
    Q=Unknown(float2, (N,), 1),
    v0=Sparse((E,), (N,), 2),
    v1=Sparse((E,), (N,), 3),
)
e = E()
r = Residuals(edge=[P(v0(e))(0) * Q(v0(e))(1) - P(v1(e))(2),
                    Q(v0(e))(0) + P(v0(e))(1)])
"""
    rng = np.random.RandomState(7)
    Nn, Ee = 20, 55
    v0 = rng.randint(0, Nn, size=Ee).astype(np.int32)
    v1 = ((v0 + 1 + rng.randint(0, Nn - 1, size=Ee)) % Nn).astype(np.int32)
    base = {"P": rng.rand(Nn, 3).astype(np.float32),
            "A": rng.rand(Nn, 3).astype(np.float32),
            "Q": rng.rand(Nn, 2).astype(np.float32), "v0": v0, "v1": v1}
    for mode in ("fwd", "rev"):
      for energy in (src, src2):
        os.environ["THALLO_JAC_MODE"] = mode
        try:
            spec = tl.load_energy(energy)
            plan = spec.plan({"N": Nn, "E": Ee})
            names = {im.name for im in spec.unknowns} | {a.name for a in spec.arrays}
            plan.init({k: v for k, v in base.items()
                       if k in names or k in ("v0", "v1")})
            g = plan.compiled.groups[0].group
            U = plan._U
            ains = plan._all_inputs()
            c = plan.compiled.group_consts(ains)[0]
            r_rm, jacs_rm = g.point_jacobians(U, ains, c)
            r_cm, jacs_cm = g.point_jacobians_cm(U, ains, c)
            np.testing.assert_allclose(np.asarray(r_cm), np.asarray(r_rm).T,
                                       rtol=1e-6, atol=1e-7)
            assert len(jacs_cm) == len(jacs_rm) == len(g.uslots)
            for jc, jr in zip(jacs_cm, jacs_rm):
                # [rc, C, R] vs [R, rc, C]
                np.testing.assert_allclose(
                    np.asarray(jc), np.transpose(np.asarray(jr), (1, 2, 0)),
                    rtol=1e-6, atol=1e-7)
        finally:
            os.environ.pop("THALLO_JAC_MODE", None)


def test_cli_runs_a_model(capsys):
    from thallo_tpu import cli

    assert cli.main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "image_warping" in out and "bundle_fusion" in out
    assert cli.main(["procrustes_alignment", "--iters", "4", "--liters", "8",
                     "--verbosity", "0"]) == 0
    out = capsys.readouterr().out
    assert "procrustes_alignment" in out and "| Event |" in out


def test_gather_onehot_two_digit_expand():
    """S > 256 routes gather_with_onehot_transpose through the two-digit
    decomposition — must stay bit-exact with the take gather and keep
    its AD transpose (the one-hot segment sum) and vmap batching."""
    import jax

    from thallo_tpu.ops.segsum import gather_with_onehot_transpose

    rng = np.random.RandomState(3)
    S, R, C = 777, 3000, 4  # odd S: exercises the padded top digit
    src = jnp.asarray(rng.randn(S, C).astype(np.float32) * 50)
    idx = jnp.asarray(rng.randint(0, S, R).astype(np.int32))
    out = gather_with_onehot_transpose(src, idx, S)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(src)[np.asarray(idx)])
    g = jax.grad(lambda s: gather_with_onehot_transpose(s, idx, S).sum())(src)
    cnt = np.bincount(np.asarray(idx), minlength=S).astype(np.float32)
    np.testing.assert_allclose(np.asarray(g), np.tile(cnt[:, None], (1, C)),
                               rtol=1e-6)
    vb = jax.vmap(lambda s: gather_with_onehot_transpose(s, idx, S))(
        jnp.stack([src, 2 * src]))
    assert vb.shape == (2, R, C)
