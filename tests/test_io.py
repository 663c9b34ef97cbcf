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


# ---- PLY mesh IO (reference loads meshes via OpenMesh,
# examples/shared/OpenMesh.h; ARAP builds one graph entry per half-edge) --


def _quad_mesh():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    return verts, faces


def test_ply_roundtrip_binary_and_ascii(tmp_path):
    from thallo_tpu.io import load_ply, save_ply

    verts, faces = _quad_mesh()
    q = np.array([0.1, 0.2, 0.3, 0.4], np.float32)
    for ascii_mode in (False, True):
        path = str(tmp_path / f"mesh_{ascii_mode}.ply")
        save_ply(path, verts, faces, ascii=ascii_mode, quality=q)
        v2, f2, props = load_ply(path)
        np.testing.assert_allclose(v2, verts, rtol=1e-6)
        assert (f2 == faces).all()
        np.testing.assert_allclose(props["quality"], q, rtol=1e-6)


def test_ply_quad_fan_triangulation(tmp_path):
    from thallo_tpu.io import load_ply

    path = str(tmp_path / "quad.ply")
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                "element vertex 4\n"
                "property float x\nproperty float y\nproperty float z\n"
                "element face 1\n"
                "property list uchar int vertex_indices\n"
                "end_header\n"
                "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
                "4 0 1 2 3\n")
    v, fcs, _ = load_ply(path)
    assert v.shape == (4, 3)
    assert (fcs == np.array([[0, 1, 2], [0, 2, 3]])).all()


def test_edges_from_faces():
    from thallo_tpu.io import edges_from_faces

    _, faces = _quad_mesh()
    und = edges_from_faces(faces, directed=False)
    assert und.shape == (5, 2)  # quad diagonal shared once
    d = edges_from_faces(faces, directed=True)
    assert d.shape == (10, 2)
    assert set(map(tuple, d)) == {tuple(e) for e in und} | {
        (b, a) for a, b in map(tuple, und)}


def test_arap_from_ply_end_to_end(tmp_path):
    """Real-data driver path: PLY file -> mesh_to_arap_inputs -> solve."""
    from thallo_tpu.io import load_ply, mesh_to_arap_inputs, save_ply
    from thallo_tpu.models import arap_mesh_deformation as arap

    side = 6
    xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    verts = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(side - 1):
        for j in range(side - 1):
            v = i * side + j
            faces.append([v, v + side, v + 1])
            faces.append([v + 1, v + side, v + side + 1])
    path = str(tmp_path / "grid.ply")
    save_ply(path, verts, np.asarray(faces, np.int32))

    v2, f2, _ = load_ply(path)
    inputs, sizes = mesh_to_arap_inputs(
        v2, f2, constraints={0: v2[0], side * side - 1: v2[-1] + [1.0, 1.0, 2.0]})
    plan = arap.make_spec().plan(sizes, solver="gauss_newton")
    c0 = plan.init(inputs)
    final = plan.solve()
    assert np.isfinite(final) and final < 0.5 * c0, (c0, final)


def test_image_roundtrip(tmp_path):
    from thallo_tpu.io import load_image, save_image

    rng = np.random.RandomState(0)
    img = rng.rand(12, 17).astype(np.float32)
    for ext in ("png", "pgm"):
        p = str(tmp_path / f"img.{ext}")
        save_image(p, img)
        back = load_image(p)
        assert back.shape == img.shape
        np.testing.assert_allclose(back, img, atol=1.0 / 255)
    rgb = rng.rand(8, 9, 3).astype(np.float32)
    p = str(tmp_path / "img_rgb.ppm")
    save_image(p, rgb)
    back = load_image(p)
    np.testing.assert_allclose(back, rgb, atol=1.0 / 255)


def test_pnm_fallback_paths(tmp_path):
    from thallo_tpu.io.image import _load_pnm, _save_pnm

    a = (np.arange(20).reshape(4, 5) * 12 % 256).astype(np.uint8)
    p = str(tmp_path / "x.pgm")
    _save_pnm(p, a)
    assert (_load_pnm(p) == a).all()


# ---- committed sample data (examples/data, scripts/make_sample_data.py) --


def _data(name):
    import os

    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples", "data", name)


def test_committed_bal_sample_solves():
    loaded, sizes = bal_to_inputs(_data("sample_scene.bal.txt"))
    assert sizes == {"C": 10, "P": 256, "O": 2560}
    spec = ba.make_spec()
    plan = spec.plan(sizes, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 5)
    plan.set_solver_parameter("lIterations", 10)
    c0 = plan.init(loaded)
    final = plan.solve()
    assert final < c0, (c0, final)


def test_committed_ply_sample_solves():
    from thallo_tpu.io import load_ply, mesh_to_arap_inputs
    from thallo_tpu.models import arap_mesh_deformation as arap

    verts, faces, _ = load_ply(_data("sample_mesh.ply"))
    assert len(verts) == 1024 and len(faces) == 1922
    # pull one corner up, pin the opposite one (a real deformation —
    # unconstrained ARAP is trivially zero-cost at init)
    pull = {0: verts[0] + np.array([0, 0, 0.5], np.float32),
            len(verts) - 1: verts[-1]}
    inputs, sizes = mesh_to_arap_inputs(verts, faces, constraints=pull)
    spec = arap.make_spec()
    plan = spec.plan(sizes)
    plan.set_solver_parameter("nIterations", 4)
    plan.set_solver_parameter("lIterations", 10)
    c0 = plan.init(inputs)
    final = plan.solve()
    assert 0 < final < 0.5 * c0, (c0, final)
