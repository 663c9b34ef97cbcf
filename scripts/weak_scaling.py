"""Simulated scaling evidence on the virtual CPU mesh (the strongest
multi-chip claim available without an N-chip slice — VERDICT r2 item 5,
extended to three workload classes in r5 per VERDICT r4 item 6).

For mesh sizes 1/2/4/8, shard each workload's domains over the mesh and
record:
  * per-device bytes of the unknowns and of the BSR row/col tables
    (the dominant resident state) — must fall ~1/N;
  * static collective bytes of the compiled step — must stay
    O(unknown bytes) / halo-sized, not O(edge/residual bytes), after
    the round-3 owner-sharding work.

Workloads: skewed BA (BSR + one-hot cameras + transpose pairs), the
same at 250k observations, stencil image_warping (2-D halo), ARAP graph
(edge-sharded).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=.:/root/.axon_site python scripts/weak_scaling.py [--small]
Writes artifacts/weak_scaling.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shard_bytes(arr):
    sh = arr.addressable_shards[0]
    import numpy as np

    return int(np.prod(sh.data.shape)) * arr.dtype.itemsize


def _finish(plan, mesh, extra=None):
    import jax

    from thallo_tpu.parallel.mesh import collective_stats, compiled_step_hlo
    from thallo_tpu.solver.blocksparse import GroupBsr

    unknown_bytes = sum(shard_bytes(v) for v in plan._U.values())
    table_bytes = 0
    for x in jax.tree_util.tree_leaves(
        plan._prep, is_leaf=lambda x: isinstance(x, GroupBsr)
    ):
        if isinstance(x, GroupBsr):
            for arrs in (x.perms, x.masks, x.cols):
                table_bytes += sum(shard_bytes(a) for a in arrs)
    with mesh:
        st = collective_stats(compiled_step_hlo(plan))
        ok = plan.step()
    coll = (st["all_gather_bytes"] + st["all_reduce_bytes"]
            + st["collective_permute_bytes"] + st["reduce_scatter_bytes"])
    row = {
        "unknown_bytes_per_device": unknown_bytes,
        "bsr_table_bytes_per_device": table_bytes,
        "collective_bytes_static": coll,
        "collectives": st,
        "step_ok": bool(ok),
        "cost": float(plan.cost()),
    }
    row.update(extra or {})
    return row


def measure_ba(n_devices, n_points=4096, obs_per_pt=6):
    import numpy as np

    from thallo_tpu.models import bundle_adjustment as ba
    from thallo_tpu.parallel.mesh import make_mesh, shard_plan_inputs

    ins, _ = ba.skewed_inputs(n_cameras=32, n_points=n_points,
                              target_obs=obs_per_pt * n_points, max_deg=128,
                              seed=11, round_obs_to=8)
    O = len(ins["oToC"])
    spec = ba.make_spec()
    plan = spec.plan({"C": 32, "P": n_points, "O": O},
                     solver="levenberg_marquardt")
    plan.set_solver_parameter("lIterations", 8)
    plan.init({k: np.copy(v) for k, v in ins.items()})
    mesh = make_mesh(n_devices, axis_names=("x",))
    shard_plan_inputs(plan, mesh, dim_axes={"P": "x", "O": "x"})
    return _finish(plan, mesh, {"n_devices": n_devices, "O": O})


def measure_stencil(n_devices, W=64, H=32):
    from thallo_tpu.models import image_warping
    from thallo_tpu.parallel.mesh import make_mesh, shard_plan_inputs

    spec = image_warping.make_spec()
    plan = spec.plan({"W": W, "H": H}, solver="levenberg_marquardt")
    plan.set_solver_parameter("lIterations", 4)
    plan.init(image_warping.synthetic_inputs(W, H))
    axes = ("x", "y") if n_devices > 1 else ("x",)
    mesh = make_mesh(n_devices, axis_names=axes)
    dim_axes = {"W": "x"}
    if n_devices > 1:
        dim_axes["H"] = "y"
    shard_plan_inputs(plan, mesh, dim_axes=dim_axes)
    return _finish(plan, mesh, {"n_devices": n_devices, "R": W * H})


def measure_arap(n_devices, side=64):
    from thallo_tpu.models import arap_mesh_deformation as arap
    from thallo_tpu.parallel.mesh import (make_mesh, shard_plan_inputs,
                                          sort_edges_by_owner)

    N = side * side
    ai = arap.synthetic_inputs(side=side)
    E = len(ai["V0"])
    spec = arap.make_spec()
    plan = spec.plan({"N": N, "E": E}, solver="gauss_newton")
    plan.set_solver_parameter("lIterations", 4)
    ai2, _ = sort_edges_by_owner(ai, plan.spec, "E", "V0", n_devices)
    plan.init(ai2)
    mesh = make_mesh(n_devices, axis_names=("x",))
    shard_plan_inputs(plan, mesh, dim_axes={"N": "x", "E": "x"})
    return _finish(plan, mesh, {"n_devices": n_devices, "E": E})


def main():
    small = "--small" in sys.argv
    workloads = {
        "bundle_adjustment_skew_24k": lambda n: measure_ba(n),
        "image_warping_stencil_64x32": lambda n: measure_stencil(n),
        "arap_graph_64": lambda n: measure_arap(n),
    }
    if not small:
        # the 250k-observation class (VERDICT r4 item 6): CPU-mesh step
        # is slow at this size, so one step per mesh size only
        workloads["bundle_adjustment_skew_250k"] = (
            lambda n: measure_ba(n, n_points=31250, obs_per_pt=8))
    out = {}
    for name, fn in workloads.items():
        rows = [fn(n) for n in (1, 2, 4, 8)]
        b1 = (rows[0]["unknown_bytes_per_device"]
              + rows[0]["bsr_table_bytes_per_device"])
        b8 = (rows[-1]["unknown_bytes_per_device"]
              + rows[-1]["bsr_table_bytes_per_device"])
        out[name] = {
            "rows": rows,
            "per_device_state_ratio_1_to_8": round(b1 / max(b8, 1), 2),
        }
        print(name, "state ratio 1->8:",
              out[name]["per_device_state_ratio_1_to_8"],
              "collective bytes @8:", rows[-1]["collective_bytes_static"])
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "weak_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
