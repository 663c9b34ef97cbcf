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


def _put(arr, sharding):
    # multi-controller-safe placement: device_put cannot target
    # non-addressable devices on a multi-host mesh; the callback form
    # lets every process materialize only its addressable shards
    # (each host may also hand in a memory-mapped loader this way)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def shard_bsr_tables(bsr, mesh: Mesh, name_axes: Dict[str, str]):
    """Shard a graph group's degree-padded row tables by row block.

    A row table's first axis enumerates the unknown's elements, so
    splitting it along the unknown dim's mesh axis makes every
    downstream [*, N] buffer — the gathered setup payload, the
    materialized J^T J blocks, the per-step block-matvec accumulator —
    partition by unknown shard instead of replicating (the dominant
    per-chip memory + bandwidth term for graph energies).  Column
    tables are [D, N_row] and shard their last axis the same way.
    Tables whose unknown dim is unmapped or indivisible stay
    replicated.  Returns a new GroupBsr with placed arrays."""
    import dataclasses as _dc

    repl = NamedSharding(mesh, P())
    perms, masks = [], []
    table_ax = []
    for t, (perm, mask) in enumerate(zip(bsr.perms, bsr.masks)):
        dims = bsr.row_dims[t] if t < len(bsr.row_dims) else ()
        sel = bsr.row_sels[t] if t < len(bsr.row_sels) else None
        ax = name_axes.get(dims[0]) if dims else None
        N = perm.shape[0]
        # overflow levels (sel is not None) cover only the high-degree
        # tail — small by construction, so they replicate
        if sel is None and ax is not None and N % mesh.shape[ax] == 0:
            sh = NamedSharding(mesh, P(ax, None))
        else:
            ax, sh = None, repl
        table_ax.append(ax)
        perms.append(_put(perm, sh))
        masks.append(_put(mask, sh))
    cols = []
    for ct, c in enumerate(bsr.cols):
        ax = table_ax[bsr.col_row[ct]] if ct < len(bsr.col_row) else None
        sh = NamedSharding(mesh, P(None, ax)) if ax is not None else repl
        cols.append(_put(c, sh))
    # every pytree child gets an explicit placement: unplaced
    # single-device arrays mixed with mesh-placed ones fail the
    # global-array consistency check at dispatch on multi-host meshes
    row_sels = tuple(None if s is None else _put(s, repl)
                     for s in bsr.row_sels)
    oh_idxs = tuple(None if x is None else _put(x, repl)
                    for x in bsr.oh_idxs)
    return _dc.replace(bsr, perms=tuple(perms), masks=tuple(masks),
                       cols=tuple(cols), row_sels=row_sels, oh_idxs=oh_idxs)


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
        return _put(arr, NamedSharding(mesh, P(*parts)))

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
        return _put(arr, NamedSharding(mesh, P(*parts)))

    images = {im.name: im for im in list(spec.unknowns) + list(spec.arrays)}
    smaps = {sm.name: sm for sm in spec.sparse_maps}
    unknown_names = {im.name for im in spec.unknowns}
    # host-side prep (gathered const tables, BSR row tables) needs FULL
    # array values; build it from the pre-placement (process-local)
    # arrays — placement never changes values — then replicate its
    # leaves onto the mesh so the jitted step sees a consistent global
    # placement even when this process can't address every shard
    old_const = {k: v for k, v in plan._inputs.items() if k not in unknown_names}
    prep = plan.compiled.prepare(old_const)
    repl = NamedSharding(mesh, P())
    # prep trees carry non-array leaves (IndexDomain objects in
    # bdeps/ideps for contraction-dependent bounds) — place only arrays.
    # Graph-group BSR row tables shard by row block (their downstream
    # J^T J blocks then partition with the unknowns); everything else
    # replicates.
    from ..solver.blocksparse import GroupBsr

    def _place_prep(x):
        if isinstance(x, GroupBsr):
            return shard_bsr_tables(x, mesh, name_axes)
        if isinstance(x, (np.ndarray, jax.Array)):
            return _put(x, repl)
        return x

    plan._prep = jax.tree_util.tree_map(
        _place_prep, prep,
        is_leaf=lambda x: isinstance(x, GroupBsr),
    )
    new_inputs = {}
    for k, v in plan._inputs.items():
        if k in images:
            new_inputs[k] = place_image(images[k], v)
        elif k in smaps:
            new_inputs[k] = place_sparse(smaps[k], v)
        else:
            new_inputs[k] = _put(v, NamedSharding(mesh, P()))
    plan._inputs = new_inputs
    plan._mesh = mesh
    # sharding-constraint context for the solver: per-unknown partition
    # specs so accumulators reduce to owner shards inside the jitted step
    # (gn.CompiledSolver._constrain_u)
    u_specs = {}
    for im in spec.unknowns:
        parts = []
        used = set()
        for i, d in enumerate(im.dims):
            ax = name_axes.get(d.name)
            if (ax is not None and ax not in used
                    and d.size % mesh.shape[ax] == 0):
                parts.append(ax)
                used.add(ax)
            else:
                parts.append(None)
        u_specs[im.name] = tuple(parts)
    plan.compiled.shard_ctx = (mesh, u_specs, dict(name_axes))
    # U must not alias _inputs (donation safety, see Plan.init)
    plan._U = {im.name: jax.numpy.copy(new_inputs[im.name]) for im in spec.unknowns}
    # keep the plan's derived state consistent with the re-placed arrays:
    # _step_inputs() feeds _const_inputs into the jitted step
    plan._const_inputs = {
        k: v for k, v in new_inputs.items() if k not in unknown_names
    }
    if plan._lm is not None:
        repl = NamedSharding(mesh, P())
        plan._lm = jax.tree_util.tree_map(lambda x: _put(x, repl), plan._lm)
    return plan


# ---------------------------------------------------------------------------
# distribution evidence (the proof the reference could never give: that the
# compiled step actually communicates over the mesh instead of silently
# all-gathering and replicating)
# ---------------------------------------------------------------------------
def compiled_step_hlo(plan) -> str:
    """Compile the (sharded) nonlinear step against the plan's current
    operand placements and return the optimized HLO text."""
    lowered = jax.jit(plan.compiled.nonlinear_step).lower(
        plan._U, plan._lm, plan._step_inputs(), plan._sp(), plan._prep
    )
    return lowered.compile().as_text()


def collective_stats(hlo_text: str):
    """Count SPMD collectives in optimized HLO, with per-kind byte totals
    where an output shape is attached (counts alone mislead: 300 tiny
    partial halo gathers matter less than one full-array gather)."""
    import re

    out = {
        "collective_permute": len(re.findall(r"collective-permute", hlo_text)),
        "all_reduce": len(re.findall(r"all-reduce", hlo_text)),
        "all_gather": len(re.findall(r"all-gather", hlo_text)),
        "reduce_scatter": len(re.findall(r"reduce-scatter", hlo_text)),
        "all_to_all": len(re.findall(r"all-to-all", hlo_text)),
    }
    itemsize = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "bf16": 2,
                "f16": 2, "s8": 1, "u8": 1, "pred": 1}
    shape_re = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    for kind, op in (("all_gather", "all-gather"),
                     ("all_reduce", "all-reduce"),
                     ("collective_permute", "collective-permute"),
                     ("reduce_scatter", "reduce-scatter")):
        total = 0
        # line-based: handles async forms (-start; skip -done to avoid
        # double counting) and tuple-shaped results — sum every result
        # shape on the LHS of the op
        op_re = re.compile(r"=\s*(\(?[^=]*?)\s" + op + r"(-start)?[.(]")
        for line in hlo_text.splitlines():
            if op + "(" not in line and op + "-start(" not in line and \
               op + "." not in line:
                continue
            m = op_re.search(line)
            if not m:
                continue
            for dt, dims in shape_re.findall(m.group(1)):
                n = 1
                for s in dims.split(","):
                    if s:
                        n *= int(s)
                total += n * itemsize.get(dt, 4)
        out[kind + "_bytes"] = total
    return out


def distribution_report(plan):
    """Per-unknown placement evidence after a sharded step: how many
    devices hold shards, the per-device shard shape, and whether the array
    is actually partitioned (fails the replication smell test if every
    shard equals the global shape)."""
    out = {}
    for name, v in plan._U.items():
        shards = v.addressable_shards
        out[name] = {
            "global_shape": tuple(v.shape),
            "n_devices": len(v.sharding.device_set),
            "shard_shapes": sorted({tuple(s.data.shape) for s in shards}),
            "replicated": bool(v.sharding.is_fully_replicated),
            "bytes_per_device": int(
                np.prod(shards[0].data.shape) * v.dtype.itemsize
            ) if shards else 0,
        }
    return out


def sort_edges_by_owner(inputs, spec, edge_dim_name: str, owner_map_name: str,
                        n_shards: int):
    """Permute the edge/observation domain so edges are contiguous by the
    owning shard of `owner_map_name`'s target vertex (edge-partition
    locality: per-shard scatters stay mostly local instead of reducing
    across every shard).  Residual sums are permutation-invariant, so this
    never changes results — it only changes communication.  Returns (new
    inputs dict, permutation).

    The reference has no analog (single GPU); this is the TPU-native
    version of its `coherent` access hint (thallo.t Sparse set_coherent:
    sorted edges -> warp-coherent gathers)."""
    sm = next(s for s in spec.sparse_maps if s.name == owner_map_name)
    if len(sm.in_dims) != 1 or sm.in_dims[0].name != edge_dim_name:
        raise ValueError(f"{owner_map_name} is not a 1-D map over {edge_dim_name}")
    owner = np.asarray(inputs[owner_map_name]).reshape(-1)
    sizes = [d.size for d in sm.out_dims]
    n_owner = (int(np.prod(sizes)) if all(s is not None for s in sizes)
               else int(owner.max()) + 1)
    shard_of = (owner.astype(np.int64) * n_shards) // max(n_owner, 1)
    order = np.argsort(shard_of, kind="stable")
    new_inputs = dict(inputs)
    for s in spec.sparse_maps:
        if len(s.in_dims) == 1 and s.in_dims[0].name == edge_dim_name:
            new_inputs[s.name] = np.asarray(inputs[s.name])[order]
    for im in spec.arrays:
        if im.dims and im.dims[0].name == edge_dim_name:
            new_inputs[im.name] = np.asarray(inputs[im.name])[order]
    for im in spec.unknowns:
        if im.dims and im.dims[0].name == edge_dim_name:
            new_inputs[im.name] = np.asarray(inputs[im.name])[order]
    return new_inputs, order
