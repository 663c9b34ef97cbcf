"""Multi-chip scaling via jax.sharding meshes.

The reference is a single-GPU system (SURVEY.md §2.4): its parallelism is
the CUDA grid/warp hierarchy and its "communication" is warp shuffles +
global atomics (/root/reference/API/src/cuda_util.t:204-451).  The TPU
build scales past one chip by domain decomposition:

* residual/unknown grids are sharded over mesh axes (spatial partitioning
  of index spaces);
* stencil neighbor access (`jnp.roll`) becomes a halo exchange
  (XLA inserts collective-permutes over ICI);
* PCG scalar reductions (alpha/beta/Q/cost dots) become `psum`s;
* graph scatters (`segment_sum`) become scatter + reduce.

All of this falls out of `jit` with sharded operands — XLA's SPMD
partitioner inserts the collectives; we only annotate placements.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_names=("x",), shape=None) -> Mesh:
    """Build a device mesh.  For 2 axis names and no explicit shape, pick
    the most-square factorization (e.g. 8 -> (4, 2))."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        elif len(axis_names) == 2:
            a = int(np.floor(np.sqrt(n)))
            while n % a:
                a -= 1
            shape = (max(a, n // a), min(a, n // a))
        else:
            raise ValueError("give an explicit mesh shape for >2 axes")
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def shard_plan_inputs(plan, mesh: Mesh, dim_axes: Dict[str, int] = None):
    """Place a plan's bound inputs/unknowns onto the mesh.

    dim_axes maps Dim names -> mesh axis name (default: first declared dim
    -> first mesh axis, second -> second if present).  Arrays over unmapped
    or indivisible dims are replicated.  Sparse maps are replicated (graph
    edges; shard later via edge partitioning).
    """
    spec = plan.spec
    if dim_axes is None:
        dim_axes = {}
        for d, ax in zip(spec.dims, mesh.axis_names):
            dim_axes[d.name] = ax
    dim_axes = {k: mesh.axis_names.index(v) if isinstance(v, str) else v for k, v in dim_axes.items()}
    # re-index to axis names
    name_axes = {k: mesh.axis_names[v] for k, v in dim_axes.items()}

    def place_image(im, arr):
        parts = []
        used = set()
        for i, d in enumerate(im.dims):
            ax = name_axes.get(d.name)
            if ax is not None and ax not in used and arr.shape[i] % mesh.shape[ax] == 0:
                parts.append(ax)
                used.add(ax)
            else:
                parts.append(None)
        parts.append(None)
        return jax.device_put(arr, NamedSharding(mesh, P(*parts)))

    def place_sparse(sm, arr):
        # shard the in-space (edge/observation) axes: residual-domain
        # decomposition; per-shard partial scatters reduce via XLA
        parts = []
        used = set()
        for i, d in enumerate(sm.in_dims):
            ax = name_axes.get(d.name)
            if ax is not None and ax not in used and arr.shape[i] % mesh.shape[ax] == 0:
                parts.append(ax)
                used.add(ax)
            else:
                parts.append(None)
        parts += [None] * (arr.ndim - len(sm.in_dims))
        return jax.device_put(arr, NamedSharding(mesh, P(*parts)))

    images = {im.name: im for im in list(spec.unknowns) + list(spec.arrays)}
    smaps = {sm.name: sm for sm in spec.sparse_maps}
    new_inputs = {}
    for k, v in plan._inputs.items():
        if k in images:
            new_inputs[k] = place_image(images[k], v)
        elif k in smaps:
            new_inputs[k] = place_sparse(smaps[k], v)
        else:
            new_inputs[k] = jax.device_put(v, NamedSharding(mesh, P()))
    plan._inputs = new_inputs
    unknown_names = {im.name for im in spec.unknowns}
    # U must not alias _inputs (donation safety, see Plan.init)
    plan._U = {im.name: jax.numpy.copy(new_inputs[im.name]) for im in spec.unknowns}
    # keep the plan's derived state consistent with the re-placed arrays:
    # _step_inputs() feeds _const_inputs into the jitted step, and _prep
    # holds host-prepared gathers of them
    plan._const_inputs = {
        k: v for k, v in new_inputs.items() if k not in unknown_names
    }
    plan._prep = plan.compiled.prepare(plan._const_inputs)
    if plan._lm is not None:
        repl = NamedSharding(mesh, P())
        plan._lm = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), plan._lm)
    return plan
