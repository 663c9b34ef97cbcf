"""Compile-only smoke harness: load an energy file, bind small dims, and
lower + jit-trace the full solver without executing a solve.

The analog of the reference's energy_unit_tests/compile.t:1-14 (fixed
dims {32,...}, full problemSpecFromFile -> compilePlan pipeline, no
execution).  Usable from the command line:

    python -m thallo_tpu.utils.compile_check path/to/energy.py [dim ...]
"""
from __future__ import annotations

import sys

import jax


def compile_check(path: str, default_dim: int = 32, dims=None, solver="levenberg_marquardt"):
    """Returns the Plan after tracing the step function (raises on any
    lowering/trace error)."""
    from ..lib_env import load_energy_file
    from ..solver.gn import LMState, SolverParams
    import jax.numpy as jnp
    import numpy as np

    spec = load_energy_file(path)
    sizes = dims or {d.name: default_dim for d in spec.dims}
    plan = spec.plan(sizes, solver=solver)
    comp = plan.compiled
    # abstract trace of the step (no data, no execution)
    dt = plan.dtype
    U = {
        im.name: jax.ShapeDtypeStruct(tuple(d.size for d in im.dims) + (im.channels,), dt)
        for im in spec.unknowns
    }
    inputs = dict(U)
    for im in spec.arrays:
        inputs[im.name] = jax.ShapeDtypeStruct(
            tuple(d.size for d in im.dims) + (im.channels,), dt
        )
    for sm in spec.sparse_maps:
        inputs[sm.name] = jax.ShapeDtypeStruct(
            tuple(d.size for d in sm.in_dims) + (len(sm.out_dims),), jnp.int32
        )
    for p in spec.params:
        inputs[p.name] = jax.ShapeDtypeStruct((), dt)
    lm = LMState(
        trust_region_radius=jax.ShapeDtypeStruct((), dt),
        radius_decrease_factor=jax.ShapeDtypeStruct((), dt),
        prev_cost=jax.ShapeDtypeStruct((), dt),
        n_iter=jax.ShapeDtypeStruct((), jnp.int32),
        ssq={k: v for k, v in U.items()},
        finished=jax.ShapeDtypeStruct((), jnp.bool_),
    )
    sp = SolverParams.from_dict(
        {k: v for k, v in plan.solver_parameters.items()}, dt
    )
    sp = jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), sp)
    jax.eval_shape(comp.nonlinear_step, U, lm, inputs, sp)
    return plan


def main(argv):
    if not argv:
        print("usage: python -m thallo_tpu.utils.compile_check <energy.py> [N ...]")
        return 2
    path = argv[0]
    dims = None
    if len(argv) > 1:
        dims = [int(a) for a in argv[1:]]
    plan = compile_check(path, dims=dims)
    print(f"compile ok: {len(plan.compiled.groups)} group(s): "
          + ", ".join(f"{g.name}[{g.schedule.value}]" for g in plan.compiled.groups))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
