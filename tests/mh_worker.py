"""Two-process multihost worker (launched by test_multihost.py):
a full sharded GN solve spanning two jax.distributed processes —
the pod execution model (SURVEY.md §5 distributed backend) scaled
down to two local CPU "hosts" of 2 devices each."""
import sys
import numpy as np
proc = int(sys.argv[1]); port = sys.argv[2]
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from thallo_tpu.parallel import multihost, shard_plan_inputs
from thallo_tpu.models import image_warping

multihost.initialize(coordinator_address=f"localhost:{port}",
                     num_processes=2, process_id=proc)
assert jax.process_count() == 2

W, H = 32, 16
spec = image_warping.make_spec()
plan = spec.plan({"W": W, "H": H}, solver="gauss_newton", verbosity=0)
plan.set_solver_parameter("nIterations", 3)
plan.set_solver_parameter("lIterations", 6)
inputs = image_warping.synthetic_inputs(W, H)
plan.init(inputs)
# single-process reference BEFORE sharding (local devices only)
ref_plan = spec.plan({"W": W, "H": H}, solver="gauss_newton", verbosity=0)
ref_plan.set_solver_parameter("nIterations", 3)
ref_plan.set_solver_parameter("lIterations", 6)
ref_plan.init(inputs)
ref = ref_plan.solve()

mesh = multihost.global_mesh(axis_names=("x",))
assert mesh.devices.size == 4  # 2 procs x 2 local CPU devices
shard_plan_inputs(plan, mesh, dim_axes={"W": "x"})
with mesh:
    got = plan.solve()
# f32 psum reduction order differs from the local-sum order; at an
# unconverged checkpoint a ~0.2% cost gap is numerical, not logical
assert abs(got - ref) <= 5e-3 * max(abs(ref), 1.0), (got, ref)
n_local = {k: len(v.addressable_shards) for k, v in plan._U.items()}
print(f"[p{proc}] sharded solve over 2 processes ok: {got:.6f} == {ref:.6f}; "
      f"local shards {n_local}", flush=True)
