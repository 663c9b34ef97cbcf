"""Multi-host scaling helpers.

The reference is strictly single-process/single-GPU (SURVEY.md §5:
failure detection / multi-node "None").  On TPU pods, scaling past one
host uses jax.distributed: every host runs the same program, sees the
global device set, and the same `Mesh`-based sharding from
parallel/mesh.py spans hosts — collectives ride ICI within a slice and
DCN across slices, inserted by the SPMD partitioner exactly as in the
single-host case.

Exercised for real by tests/test_multihost.py::test_two_process_sharded_solve:
two jax.distributed processes (2 CPU devices each, Gloo collectives)
run a GN solve sharded over the 4-device global mesh and match the
single-process converged cost.
"""
from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Join the multi-host job (call before any other jax API).  With no
    arguments, uses the cluster environment (TPU pod metadata)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_coordinator() -> bool:
    return jax.process_index() == 0


def global_mesh(axis_names=("x",), shape=None):
    """Mesh over ALL devices in the job (all hosts).  Shardings built on
    this mesh make plan solves span hosts; each host feeds its addressable
    shard of the inputs (use jax.make_array_from_process_local_data for
    per-host loading)."""
    from .mesh import make_mesh

    return make_mesh(n_devices=len(jax.devices()), axis_names=axis_names, shape=shape)


def checkpoint_per_host(plan, path_fmt: str):
    """Coordinator-only solver-state checkpoint (unknowns are replicated
    or host-gatherable; LM scalars are replicated).  The reference has no
    checkpointing at all; for multi-host runs, write from process 0."""
    if is_coordinator():
        plan.save_state(path_fmt.format(process=jax.process_index()))
