"""Simulated weak-scaling property (artifacts/weak_scaling.json is the
committed full run of scripts/weak_scaling.py): growing the mesh must
shrink per-device resident state ~1/N while total collective bytes stay
flat (communication O(unknown bytes), never O(edge bytes))."""
import numpy as np
import pytest

import jax

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices (CPU mesh)"
)


def _measure(n_devices, n_points=1024, obs_per_pt=5):
    from thallo_tpu.models import bundle_adjustment as ba
    from thallo_tpu.parallel.mesh import (
        collective_stats,
        compiled_step_hlo,
        make_mesh,
        shard_plan_inputs,
    )

    ins, _ = ba.skewed_inputs(n_cameras=16, n_points=n_points,
                              target_obs=obs_per_pt * n_points, max_deg=64,
                              seed=11, round_obs_to=8)
    O = len(ins["oToC"])
    spec = ba.make_spec()
    plan = spec.plan({"C": 16, "P": n_points, "O": O},
                     solver="levenberg_marquardt")
    plan.set_solver_parameter("lIterations", 6)
    plan.init({k: np.copy(v) for k, v in ins.items()})
    mesh = make_mesh(n_devices, axis_names=("x",))
    shard_plan_inputs(plan, mesh, dim_axes={"P": "x", "O": "x"})

    def shard_bytes(arr):
        sh = arr.addressable_shards[0]
        return int(np.prod(sh.data.shape)) * arr.dtype.itemsize

    ub = sum(shard_bytes(v) for v in plan._U.values())
    with mesh:
        st = collective_stats(compiled_step_hlo(plan))
        ok = plan.step()
    assert ok
    coll = (st["all_gather_bytes"] + st["all_reduce_bytes"]
            + st["collective_permute_bytes"] + st["reduce_scatter_bytes"])
    return ub, coll, float(plan.cost())


@needs_devices
def test_weak_scaling_per_device_memory_and_collectives():
    ub2, coll2, c2 = _measure(2)
    ub8, coll8, c8 = _measure(8)
    # per-device SHARDED unknown state (points; the 16 cameras replicate
    # by design, 16*9*4 B on every device): exactly 1/4 going 2 -> 8
    cam_b = 16 * 9 * 4
    assert (ub8 - cam_b) <= (ub2 - cam_b) / 3.9, (ub2, ub8)
    # total collective bytes must NOT grow with the mesh (each device's
    # share then falls ~1/N); allow slack for partitioner noise
    assert coll8 <= 1.3 * coll2, (coll2, coll8)
    # same answer regardless of mesh size
    assert np.isclose(c2, c8, rtol=1e-3), (c2, c8)
