"""Proof that multi-chip execution actually DISTRIBUTES — not just that
the sharded answer matches (which replication would also satisfy).

Three pieces of evidence, on the virtual 8-device CPU mesh:
1. the optimized HLO of the sharded step contains SPMD collectives
   (collective-permute for stencil halos / all-reduce for PCG dots);
2. unknown outputs are physically partitioned: shards live on all 8
   devices with per-device shapes 1/8th of the global (a replicating
   compile FAILS this);
3. edge-partition locality: sorting edges by owner shard is answer-
   invariant while changing only the communication layout."""
import numpy as np
import pytest

import jax

from thallo_tpu.models import image_warping
from thallo_tpu.parallel import (
    collective_stats,
    compiled_step_hlo,
    distribution_report,
    make_mesh,
    shard_plan_inputs,
    sort_edges_by_owner,
)

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices (CPU mesh)"
)


def _sharded_plan(W=64, H=32):
    spec = image_warping.make_spec()
    plan = spec.plan({"W": W, "H": H}, solver="levenberg_marquardt")
    plan.set_solver_parameter("nIterations", 3)
    plan.set_solver_parameter("lIterations", 6)
    plan.init(image_warping.synthetic_inputs(W, H))
    mesh = make_mesh(8, axis_names=("x", "y"))
    shard_plan_inputs(plan, mesh, dim_axes={"W": "x", "H": "y"})
    return plan, mesh


@needs_devices
def test_sharded_step_hlo_contains_collectives():
    plan, mesh = _sharded_plan()
    with mesh:
        hlo = compiled_step_hlo(plan)
    st = collective_stats(hlo)
    # stencil halo exchange -> collective-permute; PCG dot reductions ->
    # all-reduce.  A compile that silently replicated everything would
    # have neither.
    assert st["collective_permute"] > 0, st
    assert st["all_reduce"] > 0, st


@needs_devices
def test_sharded_step_outputs_partitioned():
    plan, mesh = _sharded_plan()
    with mesh:
        plan.step()
    jax.block_until_ready(plan._U)
    rep = distribution_report(plan)
    for name, info in rep.items():
        assert info["n_devices"] == 8, (name, info)
        assert not info["replicated"], (name, info)
        # per-device shard is 1/8th of the global element count
        g = int(np.prod(info["global_shape"]))
        s = int(np.prod(info["shard_shapes"][0]))
        assert s * 8 == g, (name, info)


@needs_devices
def test_unknown_shards_on_distinct_devices():
    plan, mesh = _sharded_plan()
    with mesh:
        plan.step()
    for name, v in plan._U.items():
        devs = {s.device for s in v.addressable_shards}
        assert len(devs) == 8, (name, len(devs))


@needs_devices
def test_bsr_row_tables_shard_by_row_block():
    """Graph-group BSR row tables shard along the unknown dim's mesh
    axis, so the materialized J^T J blocks partition with the unknowns
    instead of replicating (per-chip memory/bandwidth for graph
    energies).  Answers must be unchanged."""
    import thallo_tpu as tl
    from thallo_tpu.solver.blocksparse import GroupBsr

    src = """
N, E = Dims("N", "E")
Inputs(
    X=Unknown(float2, (N,), 0),
    A=Array(float2, (N,), 1),
    v0=Sparse((E,), (N,), 2),
    v1=Sparse((E,), (N,), 3),
)
n, e = N(), E()
r = Residuals(fit=X(n) - A(n), reg=X(v0(e)) - X(v1(e)))
r.reg.JtJ.set_materialize(True)
r.reg.JtJ.set_sparse(True)
"""
    rng = np.random.RandomState(3)
    Nn, Ee = 64, 160  # both divisible by the 8-way mesh
    v0 = rng.randint(0, Nn, size=Ee).astype(np.int32)
    v1 = ((v0 + 1 + rng.randint(0, Nn - 1, size=Ee)) % Nn).astype(np.int32)
    ins = {"X": rng.rand(Nn, 2).astype(np.float32),
           "A": rng.rand(Nn, 2).astype(np.float32), "v0": v0, "v1": v1}

    def make_plan():
        spec = tl.load_energy(src)
        plan = spec.plan({"N": Nn, "E": Ee})
        plan.set_solver_parameter("nIterations", 5)
        plan.init({k: np.copy(v) for k, v in ins.items()})
        return plan

    ref_final = make_plan().solve()

    plan = make_plan()
    mesh = make_mesh(8, axis_names=("x",))
    shard_plan_inputs(plan, mesh, dim_axes={"N": "x", "E": "x"})
    bsrs = [c["bsr"] for c in plan._prep["consts"]
            if isinstance(c, dict) and isinstance(c.get("bsr"), GroupBsr)]
    assert bsrs, "no BSR tables found in sharded prep"
    for bsr in bsrs:
        # BASE row tables (full element coverage) shard by row block;
        # overflow-level tables cover only the high-degree tail and
        # replicate by design (they are tiny)
        base_seen = False
        for t, perm in enumerate(bsr.perms):
            if bsr.row_sels[t] is not None:
                continue
            base_seen = True
            assert not perm.sharding.is_fully_replicated, perm.sharding
            shard_shapes = {s.data.shape for s in perm.addressable_shards}
            assert shard_shapes == {(perm.shape[0] // 8, perm.shape[1])}
        assert base_seen
        for ct, c in enumerate(bsr.cols):
            if bsr.row_sels[bsr.col_row[ct]] is not None:
                continue
            assert not c.sharding.is_fully_replicated, c.sharding
    with mesh:
        sharded_final = plan.solve()
    assert np.isclose(ref_final, sharded_final, rtol=1e-3), (
        ref_final, sharded_final)


@needs_devices
def test_edge_sort_by_owner_answer_invariant():
    from thallo_tpu.models import arap_mesh_deformation as arap

    side = 8
    N = side * side
    base = arap.synthetic_inputs(side=side)
    E = len(base["V0"])

    def run(inputs, shard_edges):
        spec = arap.make_spec()
        plan = spec.plan({"N": N, "E": E}, solver="levenberg_marquardt")
        plan.set_solver_parameter("nIterations", 4)
        plan.set_solver_parameter("lIterations", 8)
        plan.init(inputs)
        if shard_edges:
            mesh = make_mesh(8, axis_names=("x",))
            shard_plan_inputs(plan, mesh, dim_axes={"E": "x"})
            with mesh:
                return plan.solve()
        return plan.solve()

    spec = arap.make_spec()
    sorted_inputs, order = sort_edges_by_owner(base, spec, "E", "V0", 8)
    # the permutation really reorders, and by owner shard
    assert not np.array_equal(order, np.arange(E))
    shard_of = np.asarray(sorted_inputs["V0"]).astype(np.int64) * 8 // N
    assert (np.diff(shard_of) >= 0).all()

    f_base = run(base, False)
    f_sorted = run(sorted_inputs, True)
    assert np.isclose(f_base, f_sorted, rtol=1e-3), (f_base, f_sorted)


@needs_devices
def test_graph_step_communication_is_owner_sharded():
    """Round-3 communication discipline (SURVEY §2.4): the sharded graph
    step must NOT all-reduce volume-proportional buffers.  Per-unknown
    accumulators land owner-sharded via sharding constraints, and the
    small vector operands are explicitly all-gathered (O(unknown bytes)
    per PCG iteration), so the only all-reduces left are the PCG/cost
    scalars — and this holds for ANY edge order (round 2 all-reduced
    1.3 MB/step of edge-sized buffers on this exact workload)."""
    import thallo_tpu as tl
    from thallo_tpu.models import arap_mesh_deformation as arap
    from thallo_tpu.parallel import sort_edges_by_owner
    from thallo_tpu.parallel.mesh import (
        collective_stats,
        compiled_step_hlo,
        make_mesh,
        shard_plan_inputs,
    )

    side = 32
    N = side * side
    ai = arap.synthetic_inputs(side=side)
    E = len(ai["V0"])

    def run(sort):
        spec = arap.make_spec()
        plan = spec.plan({"N": N, "E": E}, solver="gauss_newton")
        plan.set_solver_parameter("nIterations", 3)
        plan.set_solver_parameter("lIterations", 4)
        ins = {k: np.copy(v) for k, v in ai.items()}
        if sort:
            ins, _ = sort_edges_by_owner(ins, plan.spec, "E", "V0", 8)
        else:
            rng = np.random.RandomState(7)
            perm = rng.permutation(E)
            for k in ("V0", "V1", "rest"):
                if k in ins and len(ins[k]) == E:
                    ins[k] = np.asarray(ins[k])[perm]
        plan.init(ins)
        mesh = make_mesh(8, axis_names=("x",))
        shard_plan_inputs(plan, mesh, dim_axes={"N": "x", "E": "x"})
        with mesh:
            st = collective_stats(compiled_step_hlo(plan))
            plan.step()
        return st, float(plan.cost())

    st_sorted, c_sorted = run(sort=True)
    st_shuf, c_shuf = run(sort=False)
    # scalars only: alpha/beta/cost dots (a few dozen bytes)
    assert st_sorted["all_reduce_bytes"] <= 4096, st_sorted
    assert st_shuf["all_reduce_bytes"] <= 4096, st_shuf
    # answers are edge-order invariant
    assert np.isclose(c_sorted, c_shuf, rtol=1e-4), (c_sorted, c_shuf)
