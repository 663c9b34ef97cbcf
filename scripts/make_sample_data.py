"""Generate the small checked-in sample data files under examples/data/.

Real datasets (the BAL collection, scanned meshes) drop into the same
drivers unchanged — see examples/data/README.md.  These files exist so
`examples/bundle_adjustment.py --bal ...` and
`examples/arap_mesh_deformation.py --ply ...` run out of the box and so
tests/test_io.py can exercise the loaders on committed files.

Deterministic; re-running reproduces the same bytes.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "examples", "data")


def make_bal(path):
    """A BAL-format Snavely scene (10 cameras, 256 points, ~2.5k
    observations): the same file layout as the published BAL problems
    (problem-*-pre.txt), scaled to repo-committable size."""
    from thallo_tpu.io import save_bal
    from thallo_tpu.models.bundle_adjustment import synthetic_inputs

    ins, meta = synthetic_inputs(n_cameras=10, n_points=256, obs_per_point=10,
                                 seed=7, noise=2e-3)
    save_bal(path, ins["cameras"], ins["points"], ins["oToC"], ins["oToP"],
             ins["observations"])
    print(f"wrote {path}: C=10 P=256 O={meta['n_obs']}")


def make_bal_skewed(path):
    """A BAL-format scene at Ladybug-49 statistics (49 cameras, 7776
    points, ~31k observations, POWER-LAW degree distributions on both
    sides — the degree regime every real BAL problem has and uniform
    synthetic scenes do not).  The environment has no network egress, so
    the file is generated rather than downloaded; the format, the
    Snavely model, and the skew statistics match the published
    problem-49-7776-pre.txt shape."""
    from thallo_tpu.io import save_bal
    from thallo_tpu.models.bundle_adjustment import skewed_inputs

    ins, meta = skewed_inputs(n_cameras=49, n_points=7776, target_obs=31843,
                              seed=49, noise=2e-3)
    save_bal(path, ins["cameras"], ins["points"], ins["oToC"], ins["oToP"],
             ins["observations"])
    print(f"wrote {path}: C=49 P=7776 O={meta['n_obs']} (power-law degrees)")


def make_ply(path):
    """A deformed-grid triangle mesh (32x32 verts) in binary PLY —
    loadable by any mesh tool and by io.load_ply."""
    from thallo_tpu.io import save_ply

    side = 32
    g = np.linspace(-1.0, 1.0, side)
    xx, yy = np.meshgrid(g, g, indexing="ij")
    zz = 0.25 * np.sin(np.pi * xx) * np.cos(np.pi * yy)
    verts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(side - 1):
        for j in range(side - 1):
            a = i * side + j
            faces.append([a, a + 1, a + side])
            faces.append([a + 1, a + side + 1, a + side])
    save_ply(path, verts, np.asarray(faces, np.int32))
    print(f"wrote {path}: V={len(verts)} F={len(faces)}")


def main():
    os.makedirs(DATA, exist_ok=True)
    make_bal(os.path.join(DATA, "sample_scene.bal.txt"))
    make_bal_skewed(os.path.join(DATA, "skewed_scene.bal.txt"))
    make_ply(os.path.join(DATA, "sample_mesh.ply"))


if __name__ == "__main__":
    main()
