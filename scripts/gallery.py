"""Run every registered model on TPU; emit a markdown table.

Synthetic rows cover every model family; the file-data rows run the
same models through the real-data loaders (`io.bal_to_inputs`,
`io.load_ply`/`mesh_to_arap_inputs`) on the committed sample files —
the exact path a user takes with a downloaded BAL scene or scanned
mesh (examples/data/README.md documents the published formats).
"""
import json, time, traceback
from thallo_tpu import models

CONFIGS = {  # model -> (sizes kwargs for synthetic_inputs, solver, iters, liters)
    "image_warping": ({}, "levenberg_marquardt", 15, 20),
    "poisson_image_editing": ({}, "gauss_newton", 4, 50),
    "arap_mesh_deformation": ({"side": 24}, "levenberg_marquardt", 20, 30),
    "bundle_adjustment": ({"n_cameras": 8, "n_points": 512}, "levenberg_marquardt", 20, 30),
    "volumetric_mesh_deformation": ({"W": 12, "H": 12, "D": 12}, "levenberg_marquardt", 12, 15),
    "embedded_mesh_deformation": ({"side": 12}, "levenberg_marquardt", 15, 20),
    "robust_nonrigid_alignment": ({"side": 12}, "levenberg_marquardt", 12, 15),
    "procrustes_alignment": ({"N": 256}, "levenberg_marquardt", 25, 20),
    "cotangent_mesh_smoothing": ({"side": 12}, "gauss_newton", 5, 20),
    "optical_flow": ({"W": 48, "H": 48, "shift": (0.75, -0.4)}, "levenberg_marquardt", 40, 15),
    "spatially_varying_deconvolution": ({"W": 32, "H": 32}, "gauss_newton", 8, 40),
    "deconvolution": ({"W": 32, "H": 32}, "gauss_newton", 8, 40),
    "face_fitting": ({"N": 96, "M": 6}, "levenberg_marquardt", 25, 25),
    "shape_from_shading": ({"W": 48, "H": 48}, "levenberg_marquardt", 10, 12),
    "shape_and_shading": ({"W": 32, "H": 32}, "levenberg_marquardt", 20, 20),
    "intrinsic_image_decomposition": ({"W": 48, "H": 48}, "gauss_newton", 10, 30),
    "sparse_bundle_fusion": ({"n_frames": 8, "corrs_per_pair": 24}, "levenberg_marquardt", 25, 25),
    "bundle_fusion": ({"W": 12, "H": 12, "T": 4}, "levenberg_marquardt", 10, 15),
}


def _file_bal():
    from thallo_tpu.io import bal_to_inputs
    inputs, sizes = bal_to_inputs("examples/data/sample_scene.bal.txt")
    return models.get("bundle_adjustment"), inputs, sizes


def _file_ply():
    import numpy as np
    from thallo_tpu.io import load_ply, mesh_to_arap_inputs
    verts, faces, _ = load_ply("examples/data/sample_mesh.ply")
    cons = {0: verts[0],
            len(verts) - 1: verts[-1] + np.asarray([1.0, 1.0, 2.0], np.float32)}
    inputs, sizes = mesh_to_arap_inputs(verts, faces, constraints=cons)
    return models.get("arap_mesh_deformation"), inputs, sizes


FILE_CONFIGS = {  # label -> (loader, solver, iters, liters)
    "bundle_adjustment @ sample_scene.bal.txt": (_file_bal, "levenberg_marquardt", 20, 30),
    "arap_mesh_deformation @ sample_mesh.ply": (_file_ply, "levenberg_marquardt", 20, 30),
}


def run_case(name, spec_mod, inputs, sizes, solver, it, li, rows):
    try:
        spec = spec_mod.make_spec()
        if not sizes:
            sizes = {}
            for im in list(spec.unknowns) + list(spec.arrays):
                for d, s in zip(im.dims, inputs[im.name].shape):
                    sizes.setdefault(d.name, int(s))
            for sm in spec.sparse_maps:
                for d, s in zip(sm.in_dims, inputs[sm.name].shape):
                    sizes.setdefault(d.name, int(s))
        t0 = time.time()
        plan = spec.plan(sizes, solver=solver)
        plan.set_solver_parameter("nIterations", it)
        plan.set_solver_parameter("lIterations", li)
        c0 = plan.init(inputs)
        plan.step()  # plan + init + first compiled step = compile wall
        compile_s = time.time() - t0
        t0 = time.time()
        final = plan.solve()
        dt = time.time() - t0
        rows.append((name, solver, sizes, c0, final, plan.num_iterations,
                     compile_s, dt))
        print(f"OK {name}: {c0:.6g} -> {final:.6g} ({plan.num_iterations} it, "
              f"compile {compile_s:.1f}s + solve {dt:.1f}s)", flush=True)
    except Exception as e:
        rows.append((name, solver, {}, None, None, 0, 0, 0))
        print(f"FAIL {name}: {e}", flush=True)
        traceback.print_exc()


rows = []
for name, (kw, solver, it, li) in CONFIGS.items():
    try:
        mod = models.get(name)
        made = mod.synthetic_inputs(**kw)
        inputs, meta = made if isinstance(made, tuple) else (made, {})
    except Exception as e:
        rows.append((name, solver, {}, None, None, 0, 0, 0))
        print(f"FAIL {name} (inputs): {e}", flush=True)
        continue
    run_case(name, mod, inputs, None, solver, it, li, rows)

file_rows = []
for label, (loader, solver, it, li) in FILE_CONFIGS.items():
    try:
        mod, inputs, sizes = loader()
    except Exception as e:
        file_rows.append((label, solver, {}, None, None, 0, 0, 0))
        print(f"FAIL {label} (loader): {e}", flush=True)
        continue
    run_case(label, mod, inputs, sizes, solver, it, li, file_rows)

with open("/root/repo/RESULTS.md", "w") as f:
    f.write("# Model gallery (TPU v5e, single chip)\n\n")
    f.write("Generated by `scripts/gallery.py` (configs inline).  compile =\n"
            "plan + init + first compiled step (remote compiles over the\n"
            "axon relay dominate; the persistent compile cache makes warm\n"
            "re-runs much faster); solve = the remaining solve wall.\n\n")
    f.write("## Synthetic configs\n\n")
    f.write("| model | solver | dims | initial cost | final cost | outer iters | compile (s) | solve (s) |\n")
    f.write("|---|---|---|---|---|---|---|---|\n")
    total_c = total_s = 0.0
    for name, solver, sizes, c0, final, it, compile_s, dt in rows:
        dimstr = ",".join(f"{k}={v}" for k, v in sizes.items())
        if c0 is None:
            f.write(f"| {name} | {solver} | — | FAILED | — | — | — | — |\n")
        else:
            total_c += compile_s
            total_s += dt
            f.write(f"| {name} | {solver.replace('levenberg_marquardt','LM').replace('gauss_newton','GN')} "
                    f"| {dimstr} | {c0:.5g} | {final:.5g} | {it} | {compile_s:.1f} | {dt:.1f} |\n")
    f.write(f"\nTotals: compile {total_c:.1f}s, solve {total_s:.1f}s.\n")
    f.write("\n## File-data configs (real-format loaders, committed samples)\n\n")
    f.write("Same code path as a downloaded BAL scene / scanned PLY mesh\n"
            "(`io.bal_to_inputs`, `io.load_ply` + `mesh_to_arap_inputs`);\n"
            "see examples/data/README.md for pointing these at published\n"
            "datasets.\n\n")
    f.write("| case | solver | dims | initial cost | final cost | outer iters | compile (s) | solve (s) |\n")
    f.write("|---|---|---|---|---|---|---|---|\n")
    for name, solver, sizes, c0, final, it, compile_s, dt in file_rows:
        dimstr = ",".join(f"{k}={v}" for k, v in sizes.items())
        if c0 is None:
            f.write(f"| {name} | {solver} | — | FAILED | — | — | — | — |\n")
        else:
            f.write(f"| {name} | {solver.replace('levenberg_marquardt','LM').replace('gauss_newton','GN')} "
                    f"| {dimstr} | {c0:.5g} | {final:.5g} | {it} | {compile_s:.1f} | {dt:.1f} |\n")
print("gallery written")
