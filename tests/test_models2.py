"""End-to-end solves of the second wave of ported model energies
(volumetric ARAP, embedded deformation, robust alignment, procrustes,
cotangent smoothing, optical flow, spatially-varying deconvolution,
face fitting)."""
import numpy as np

from thallo_tpu.models import (
    cotangent_mesh_smoothing,
    embedded_mesh_deformation,
    face_fitting,
    optical_flow,
    procrustes_alignment,
    robust_nonrigid_alignment,
    spatially_varying_deconvolution,
    volumetric_mesh_deformation,
)


def test_volumetric_mesh_deformation():
    spec = volumetric_mesh_deformation.make_spec()
    inputs = volumetric_mesh_deformation.synthetic_inputs(6, 6, 6)
    plan = spec.plan({"W": 6, "H": 6, "D": 6}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 12)
    plan.set_solver_parameter("lIterations", 15)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert final < 0.2 * c0


def test_embedded_mesh_deformation():
    spec = embedded_mesh_deformation.make_spec()
    inputs = embedded_mesh_deformation.synthetic_inputs(side=6)
    N = 36
    E = len(inputs["v0"])
    plan = spec.plan({"N": N, "E": E}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 15)
    plan.set_solver_parameter("lIterations", 20)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert final < 0.2 * c0


def test_robust_nonrigid_alignment():
    spec = robust_nonrigid_alignment.make_spec()
    inputs = robust_nonrigid_alignment.synthetic_inputs(side=6)
    N = 36
    E = len(inputs["v0"])
    plan = spec.plan({"N": N, "E": E}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 10)
    plan.set_solver_parameter("lIterations", 15)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert final < c0


def test_procrustes_recovers_transform():
    spec = procrustes_alignment.make_spec()
    inputs, meta = procrustes_alignment.synthetic_inputs(N=64)
    plan = spec.plan({"N": 64, "U": 1}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 30)
    plan.set_solver_parameter("lIterations", 20)
    plan.init(inputs)
    final = plan.solve()
    assert final < 1e-6
    ang = np.asarray(plan.get_unknown("Angle", squeeze=False))[0]
    tr = np.asarray(plan.get_unknown("Translation", squeeze=False))[0]
    np.testing.assert_allclose(ang, meta["angle_true"], atol=1e-3)
    np.testing.assert_allclose(tr, meta["trans_true"], atol=1e-3)


def test_cotangent_mesh_smoothing():
    spec = cotangent_mesh_smoothing.make_spec()
    inputs = cotangent_mesh_smoothing.synthetic_inputs(side=6)
    N = 36
    E = len(inputs["V0"])
    plan = spec.plan({"N": N, "E": E}, solver="gauss_newton")
    plan.set_solver_parameter("nIterations", 5)
    plan.set_solver_parameter("lIterations", 20)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert final < c0
    # smoothing: z-variance of the interior should shrink
    X = np.asarray(plan.get_unknown("X", squeeze=False)).reshape(6, 6, 3)
    A = inputs["A"].reshape(6, 6, 3)
    assert X[1:-1, 1:-1, 2].std() < A[1:-1, 1:-1, 2].std()


def test_optical_flow_recovers_shift():
    # sub-pixel shift: single-scale flow has a ~1px convergence basin (the
    # reference's app uses image pyramids for larger motions)
    spec = optical_flow.make_spec()
    inputs, meta = optical_flow.synthetic_inputs(24, 24, shift=(0.75, -0.4))
    plan = spec.plan({"W": 24, "H": 24}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 50)
    plan.set_solver_parameter("lIterations", 15)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert final < 0.05 * c0
    flow = np.asarray(plan.get_unknown("X", squeeze=False))
    interior = flow[6:-6, 6:-6]
    med = np.median(interior.reshape(-1, 2), axis=0)
    np.testing.assert_allclose(med, meta["true_flow"], atol=0.1)


def test_spatially_varying_deconvolution():
    spec = spatially_varying_deconvolution.make_spec(k_half=2)
    inputs, meta = spatially_varying_deconvolution.synthetic_inputs(16, 16, Kd=5, Kc=2)
    plan = spec.plan({"W": 16, "H": 16, "Kd": 5, "Kc": 2}, solver="gauss_newton")
    plan.set_solver_parameter("nIterations", 8)
    plan.set_solver_parameter("lIterations", 40)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert final < 0.05 * c0


def test_deconvolution():
    """The plain (single-kernel) deconvolution energy behind the
    reference's deconvolution AND proximal example drivers
    (examples/deconvolution/src/CombinedSolver.h — the energy file is
    absent from the reference drop; models/deconvolution.py
    reconstructs it from the driver's parameter surface)."""
    from thallo_tpu.models import deconvolution as dc

    spec = dc.make_spec(k_half=2)
    inputs, _ = dc.synthetic_inputs(W=16, H=16, k_half=2)
    plan = spec.plan({"W": 16, "H": 16, "Kd": 5}, solver="gauss_newton")
    plan.set_solver_parameter("nIterations", 6)
    plan.set_solver_parameter("lIterations", 40)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert final < 0.2 * c0


def test_face_fitting_recovers_weights():
    spec = face_fitting.make_spec()
    inputs, meta = face_fitting.synthetic_inputs(N=48, M=4)
    plan = spec.plan({"N": 48, "M": 4, "U": 1}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 25)
    plan.set_solver_parameter("lIterations", 25)
    plan.init(inputs)
    final = plan.solve()
    w = np.asarray(plan.get_unknown("BlendshapeWeights"))
    # regularized fit: weights close to (slightly shrunk towards 0 vs) truth
    np.testing.assert_allclose(w, meta["w_true"], atol=0.1)


def test_shape_from_shading():
    from thallo_tpu.models import shape_from_shading

    spec = shape_from_shading.make_spec()
    inputs = shape_from_shading.synthetic_inputs(24, 24)
    plan = spec.plan({"W": 24, "H": 24}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 8)
    plan.set_solver_parameter("lIterations", 10)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert final < 0.5 * c0
    # all four residual groups share (x, y) -> one merged kernel
    assert len(plan.compiled.groups) == 1


def test_intrinsic_image_decomposition():
    from thallo_tpu.models import intrinsic_image_decomposition as iid

    spec = iid.make_spec()
    inputs = iid.synthetic_inputs(24, 24)
    plan = spec.plan({"W": 24, "H": 24}, solver="gauss_newton")
    plan.set_solver_parameter("nIterations", 10)
    plan.set_solver_parameter("lIterations", 30)
    c0 = plan.init(inputs)
    final = plan.solve()
    # converges to a balanced albedo/shading stationary point
    assert final < 0.6 * c0


def test_sparse_bundle_fusion_pose_graph():
    from thallo_tpu.models import sparse_bundle_fusion as sbf

    spec = sbf.make_spec()
    inputs, meta = sbf.synthetic_inputs(n_frames=5, corrs_per_pair=12)
    C = len(inputs["corr_i"])
    plan = spec.plan({"T": 5, "CorrDim": C}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 25)
    plan.set_solver_parameter("lIterations", 25)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert final < 1e-2 * c0

    # the pose graph has a global gauge freedom; compare RELATIVE
    # transforms T_i^-1 T_{i+1} against ground truth (decoded with the
    # energy's own SE(3)-exp convention)
    def mats(rots, trans):
        return [sbf.np_pose_to_matrix(r, t)
                for r, t in zip(np.asarray(rots), np.asarray(trans))]

    got = mats(plan.get_unknown("CamRotation", squeeze=False),
               plan.get_unknown("CamTranslation", squeeze=False))
    want = mats(meta["rots_true"], meta["trans_true"])
    for i in range(len(got) - 1):
        rel_got = np.linalg.inv(got[i]) @ got[i + 1]
        rel_want = np.linalg.inv(want[i]) @ want[i + 1]
        np.testing.assert_allclose(rel_got, rel_want, atol=2e-2)


def test_shape_and_shading():
    from thallo_tpu.models import shape_and_shading

    spec = shape_and_shading.make_spec()
    inputs = shape_and_shading.synthetic_inputs(20, 20)
    plan = spec.plan({"W": 20, "H": 20, "U": 1}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 30)
    plan.set_solver_parameter("lIterations", 30)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert final < 0.3 * c0
    # SH lighting unknowns moved away from the flat init
    ell = np.asarray(plan.get_unknown("ell", squeeze=False))
    assert np.abs(ell[0, 1:]).max() > 1e-4


def test_bundle_fusion_dense_and_sparse():
    """Model #17: the full BundleFusion energy — dense point-to-plane
    depth term (SampledImageArray + materialized per-pair transforms via
    .get(t_t, t_s)) + sparse correspondence term
    (reference bundle_fusion_solve.t:1-90)."""
    from thallo_tpu.models import bundle_fusion as bf

    inputs, meta = bf.synthetic_inputs(W=10, H=10, T=4)
    spec = bf.make_spec()
    plan = spec.plan(
        {"W": 10, "H": 10, "T": 4, "CorrDim": meta["n_corr"],
         "PairDim": meta["n_pairs"]},
        solver="levenberg_marquardt",
    )
    plan.set_solver_parameter("nIterations", 8)
    plan.set_solver_parameter("lIterations", 12)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert final < 0.05 * c0, (c0, final)


def test_bundle_fusion_jacobian_oracle():
    """Tiny-dims jacfwd oracle over the full dense+sparse energy: the
    dense assembly (and hence every derivative the solver uses) matches
    pure jacfwd of the lowered residuals."""
    import jax
    import jax.numpy as jnp
    from thallo_tpu.models import bundle_fusion as bf

    inputs, meta = bf.synthetic_inputs(W=5, H=5, T=3, corrs_per_pair=4)
    spec = bf.make_spec()
    plan = spec.plan({"W": 5, "H": 5, "T": 3, "CorrDim": meta["n_corr"],
                      "PairDim": meta["n_pairs"]})
    plan.init(inputs)
    comp = plan.compiled
    U, ins = plan._U, plan._step_inputs()
    consts = comp.group_consts(ins)
    masks = comp.masks(ins, U)

    def res_all(Uv):
        return jnp.concatenate(
            [gp.group.residuals(Uv, ins, c).reshape(-1)
             for gp, c in zip(comp.groups, consts)]
        )

    # column layout must match dense_jacobian's (declaration order, NOT
    # alphabetical pytree order)
    flat = comp.flatten_U(U)
    J_oracle = np.asarray(
        jax.jacfwd(lambda v: res_all(comp.unflatten_U(v)))(flat))
    r_d, J_d = comp.dense_jacobian(U, ins, consts, masks)
    np.testing.assert_allclose(np.asarray(J_d), J_oracle, rtol=2e-3, atol=2e-4)
