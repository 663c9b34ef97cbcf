"""Autoscheduler tests: heuristic mode, exhaustive enumeration, and
answer-invariance across schedules (the reference's core property:
scheduling changes performance, never results)."""
import numpy as np

import thallo_tpu as tl
from thallo_tpu.spec import JTJpSchedule

LAPLACIAN = """
W, H = Dims("W", "H")
Inputs(X=Unknown(float, (W, H), 0), A=Array(float, (W, H), 1))
w_fit = 0.2
x, y = W(), H()
r = Residuals(
    fit=w_fit * (X(x, y) - A(x, y)),
    reg=[Select(InBounds(x + 1, y + 1), X(x, y) - X(x + 1, y), 0),
         Select(InBounds(x, y + 1), X(x, y) - X(x, y + 1), 0)],
)
r.fit.J.set_materialize(True)
r.fit.JtJ.set_materialize(True)
"""


def _inputs(n, seed=0):
    rng = np.random.RandomState(seed)
    t = rng.rand(n, n).astype(np.float32)
    return {"X": t.copy(), "A": t}


def _solve(plan, inputs):
    plan.set_solver_parameter("nIterations", 5)
    plan.set_solver_parameter("lIterations", 20)
    plan.init(inputs)
    return plan.solve()


def test_heuristic_overrides_directives():
    spec = tl.load_energy(LAPLACIAN)
    plan = spec.plan({"W": 12, "H": 12}, use_autoscheduler=1)
    # directives cleared -> fit+reg merged into ONE group
    assert len(plan.compiled.groups) == 1
    assert plan.compiled.groups[0].schedule in list(JTJpSchedule)
    f_auto = _solve(plan, _inputs(12))

    spec2 = tl.load_energy(LAPLACIAN)
    plan2 = spec2.plan({"W": 12, "H": 12})
    # user directives respected -> fit (J+JtJ materialize) separate group
    assert len(plan2.compiled.groups) == 2
    f_user = _solve(plan2, _inputs(12))
    assert np.isclose(f_auto, f_user, rtol=1e-4)


def test_exhaustive_enumeration():
    finals = []
    idx = 0
    while True:
        spec = tl.load_energy(LAPLACIAN)
        try:
            plan = spec.plan({"W": 10, "H": 10}, use_autoscheduler=3 + idx)
        except IndexError:
            break
        finals.append(_solve(plan, _inputs(10)))
        idx += 1
        if idx >= 6:  # don't compile all candidates in CI; 6 is plenty
            break
    assert idx >= 4
    # schedules must not change the answer
    np.testing.assert_allclose(finals, finals[0], rtol=1e-3)


CA_ENERGY = """
W, H = Dims("W", "H")
Inputs(X=Unknown(float, (W, H), 0), A=Array(float, (W, H), 1))
x, y = W(), H()
# expensive shared subexpression accessed at 5 stencil sites (the
# shape_from_shading pattern)
shade = ComputedArray("shade", [x, y],
    sin(X(x, y)) * cos(X(x, y)) + exp(0.1 * X(x, y)) * sqrt(abs(X(x, y)) + 1.0)
    + log(abs(X(x, y)) + 2.0) * A(x, y)
    + sin(2.0 * X(x, y)) * cos(3.0 * X(x, y)) * A(x, y)
    + sqrt(abs(sin(X(x, y)) + cos(A(x, y))) + 0.5)
    + exp(-abs(X(x, y) - A(x, y))) * (X(x, y) * X(x, y) + 1.0))
cheap = ComputedArray("cheap", [x, y], X(x, y) + A(x, y))
r = Residuals(
    fit=shade(x, y) - A(x, y),
    reg=[Select(InBounds(x + 1, y), shade(x, y) - shade(x + 1, y), 0),
         Select(InBounds(x, y + 1), shade(x, y) - shade(x, y + 1), 0),
         Select(InBounds(x + 1, y + 1), shade(x, y) - shade(x + 1, y + 1), 0)],
    fit2=cheap(x, y) - 0.5 * A(x, y),
)
"""


def test_heuristic_selects_ca_materialization():
    """The reference's select_expressions_to_materialize axis: an
    expensive multi-site ComputedArray is materialized automatically; a
    trivial one stays inline — and either way the answer matches the
    all-inline plan."""
    spec = tl.load_energy(CA_ENERGY)
    plan = spec.plan({"W": 24, "H": 24}, use_autoscheduler=1)
    mats = {ca.name: ca.materialize for ca in spec.computed}
    assert mats["shade"] is True, mats
    assert mats["cheap"] is False, mats
    rng = np.random.RandomState(3)
    ins = {"X": rng.rand(24, 24).astype(np.float32),
           "A": rng.rand(24, 24).astype(np.float32)}
    f_auto = _solve(plan, dict(ins))

    spec2 = tl.load_energy(CA_ENERGY)
    plan2 = spec2.plan({"W": 24, "H": 24})  # user default: all inline
    f_user = _solve(plan2, dict(ins))
    assert np.isclose(f_auto, f_user, rtol=1e-3), (f_auto, f_user)


def test_mode2_clears_to_default():
    spec = tl.load_energy(LAPLACIAN)
    plan = spec.plan({"W": 10, "H": 10}, use_autoscheduler=2)
    assert all(gp.schedule == JTJpSchedule.LINEARIZE for gp in plan.compiled.groups)


def test_apply_separately_is_distinct_and_correct():
    """Jp.set_materialize -> APPLY_SEPARATELY (reference get_schedule
    mapping, thallo.t:4100-4134) must (a) give the same answer and (b) be
    a genuinely different execution strategy: the materialized-Jp barrier
    shows up in the compiled HLO (thallo.t:3754-3841's two-kernel split)."""
    import jax

    src = LAPLACIAN.replace("r.fit.J.set_materialize(True)\nr.fit.JtJ.set_materialize(True)",
                            "r.fit.Jp.set_materialize(True)")
    spec = tl.load_energy(src)
    from thallo_tpu.spec import JTJpSchedule

    assert spec.energy.fit.get_schedule() == JTJpSchedule.APPLY_SEPARATELY
    plan = spec.plan({"W": 12, "H": 12})
    assert any(gp.schedule == JTJpSchedule.APPLY_SEPARATELY
               for gp in plan.compiled.groups)
    f_sep = _solve(plan, _inputs(12))

    spec2 = tl.load_energy(LAPLACIAN)
    plan2 = spec2.plan({"W": 12, "H": 12})
    f_ref = _solve(plan2, _inputs(12))
    assert np.isclose(f_sep, f_ref, rtol=1e-4)

    hlo = jax.jit(plan.compiled.nonlinear_step).lower(
        plan._U, plan._lm, plan._step_inputs(), plan._sp(), plan._prep
    ).as_text()
    assert "opt-barrier" in hlo or "optimization_barrier" in hlo


def test_autoschedule_search_measures_all():
    """Compile-and-measure exhaustive search (reference's exauto loop)."""
    from thallo_tpu.autotune import autoschedule_search

    def make_inputs():
        return _inputs(10)

    import os

    os.environ["THALLO_MEASUREMENTS"] = "/tmp/sched_measurements.json"
    plan, results = autoschedule_search(
        lambda: tl.load_energy(LAPLACIAN),
        {"W": 10, "H": 10},
        make_inputs,
        n_steps=2,
        l_iters=5,
        max_candidates=6,
        log_path="/tmp/sched_search.txt",
        verbose=False,
    )
    # merged-group candidates (4 schedules) + the first split candidates
    assert len(results) == 6
    assert all(dt > 0 for _, _, dt in results)
    final = plan.solve()
    assert final > 0
    # measurements persisted for the heuristic to reuse (ROADMAP #8)
    from thallo_tpu.schedule import load_measurements

    assert load_measurements()
    del os.environ["THALLO_MEASUREMENTS"]


def test_reorder_is_real_and_answer_invariant():
    """reorder() permutes the group's external iteration order (the
    reference's loop-order directive, thallo.t:5665) — observable in the
    lowered group, invariant in the answer."""
    base = tl.load_energy(LAPLACIAN)
    pd = base.plan({"W": 10, "H": 10})
    default_orders = {g.name: [d.dim.name for d in g.group.ext_domains]
                      for g in pd.compiled.groups}

    SRC = LAPLACIAN + "\nr.reg.reorder([y, x])\n"
    spec = tl.load_energy(SRC)
    pr = spec.plan({"W": 10, "H": 10})
    reordered = {g.name: [d.dim.name for d in g.group.ext_domains]
                 for g in pr.compiled.groups}
    # the reg group must now iterate H-major
    reg_name = next(n for n in reordered if "reg" in n)
    assert reordered[reg_name][0] == "H", reordered
    assert default_orders[reg_name][0] == "W", default_orders
    np.testing.assert_allclose(
        _solve(pr, _inputs(10)), _solve(base.plan({"W": 10, "H": 10}), _inputs(10)),
        rtol=1e-4)


def test_measured_reorder_feeds_heuristic(tmp_path):
    """A recorded faster non-default domain order (keyed as autotune
    writes it over the exhaustive order enumeration) makes the heuristic
    rebuild the group with that order — the reorder slot of the cost
    model driven by measurements (ROADMAP: reorder cost fed back)."""
    import json
    import os

    from thallo_tpu.schedule import group_measure_key

    os.environ["THALLO_MEASUREMENTS"] = str(tmp_path / "m.json")
    try:
        spec = tl.load_energy(LAPLACIAN)
        plan = spec.plan({"W": 10, "H": 10}, use_autoscheduler=1)
        ref = _solve(plan, _inputs(10))
        data = {}
        for gp in plan.compiled.groups:
            doms = list(gp.group.ext_domains)
            assert len(doms) == 2
            # default order measured; reversed order measured FASTER
            data[group_measure_key(gp, gp.schedule)] = 0.010
            data[group_measure_key(gp, gp.schedule,
                                   order=[doms[1], doms[0]])] = 0.005
        (tmp_path / "m.json").write_text(json.dumps(data))

        spec2 = tl.load_energy(LAPLACIAN)
        plan2 = spec2.plan({"W": 10, "H": 10}, use_autoscheduler=1)
        orders = [[d.dim.name for d in g.group.ext_domains]
                  for g in plan2.compiled.groups]
        assert all(o[0] == "H" for o in orders), orders
        assert all(g.group.reordered for g in plan2.compiled.groups)
        np.testing.assert_allclose(_solve(plan2, _inputs(10)), ref, rtol=1e-3)

        # keys a third plan would record under the reorder stay stable
        # across spec reloads (uids differ; labels must not)
        for gp2, gp in zip(plan2.compiled.groups, plan.compiled.groups):
            assert group_measure_key(gp2, gp.schedule) in data
    finally:
        del os.environ["THALLO_MEASUREMENTS"]


def test_exhaustive_enumerates_domain_orders():
    """The exhaustive space includes domain permutations (reference
    generate_all_schedules, thallo.t:4318-4482): some candidate index
    must produce an H-major group, with an unchanged answer."""
    from thallo_tpu.schedule import enumerate_domain_orders

    base = tl.load_energy(LAPLACIAN)
    pd = base.plan({"W": 10, "H": 10})
    dorders = enumerate_domain_orders([g for g in pd.compiled.groups])
    assert len(dorders) > 1  # default + at least one permutation
    ref = _solve(pd, _inputs(10))

    found = False
    for idx in range(1, 4):
        spec = tl.load_energy(LAPLACIAN)
        plan = spec.plan({"W": 10, "H": 10}, use_autoscheduler=3 + idx)
        orders = [[d.dim.name for d in g.group.ext_domains]
                  for g in plan.compiled.groups]
        if any(o[0] == "H" for o in orders):
            found = True
            np.testing.assert_allclose(_solve(plan, _inputs(10)), ref, rtol=1e-3)
            break
    assert found, "no candidate produced a permuted domain order"


def test_set_sparse_forces_bsr_below_threshold():
    """JtJ.set_sparse(True) must force the block-sparse tables even when
    the unknown count is under the dense-JtJ threshold (reference
    set_sparse, thallo.t:5761-5772), with unchanged answers."""
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
    rng = np.random.RandomState(2)
    Nn, Ee = 12, 30  # far below DENSE_JTJ_MAX_UNKNOWNS
    v0 = rng.randint(0, Nn, size=Ee).astype(np.int32)
    v1 = ((v0 + 1 + rng.randint(0, Nn - 1, size=Ee)) % Nn).astype(np.int32)
    ins = {"X": rng.rand(Nn, 2).astype(np.float32),
           "A": rng.rand(Nn, 2).astype(np.float32), "v0": v0, "v1": v1}

    spec = tl.load_energy(src)
    plan = spec.plan({"N": Nn, "E": Ee})
    plan.init(dict(ins))
    gp = next(g for g in plan.compiled.groups if g.force_sparse)
    consts = plan._prep["consts"][plan.compiled.groups.index(gp)]
    assert consts.get("bsr") is not None, "set_sparse did not build BSR tables"
    plan.set_solver_parameter("nIterations", 6)
    sparse_final = plan.solve()

    src_plain = src.replace("r.reg.JtJ.set_materialize(True)\n", "").replace(
        "r.reg.JtJ.set_sparse(True)\n", "")
    spec2 = tl.load_energy(src_plain)
    plan2 = spec2.plan({"N": Nn, "E": Ee})
    plan2.set_solver_parameter("nIterations", 6)
    plan2.init(dict(ins))
    assert np.isclose(plan2.solve(), sparse_final, rtol=1e-3)


CROSS_SPARSE = """
E, K, N = Dims("E", "K", "N")
Inputs(X=Unknown(float, (N,), 0), A=Array(float, (K, E), 1),
       S=Sparse((E,), (N,), 2))
k = K()
e = E()
r = Residuals(fit=A(k, e) * X(S(e)) - A(k, e))
"""


def test_analytic_cold_start_reorder(tmp_path, monkeypatch):
    """Mode 1 on a COLD machine (empty measurement store) reorders a
    cross-domain group so the sparse slot's dependent domain leads the
    row-major flattening — the symbolic reorder_for_coherence analog
    (thallo.t:5308-5325).  Mechanical benefit pinned: under the chosen
    order the flattened sparse index array is SORTED (run-structured
    payload gathers / row_starts, the r4 sorted-run machinery); under
    the discovery order it interleaves.  Answers are invariant."""
    monkeypatch.setenv("THALLO_MEASUREMENTS", str(tmp_path / "empty.json"))
    rng = np.random.RandomState(3)
    E, K, N = 60, 3, 40
    s = np.sort(rng.randint(0, N, E)).astype(np.int32)
    inputs = {"X": np.zeros(N, np.float32),
              "A": rng.rand(K, E).astype(np.float32), "S": s}

    spec0 = tl.load_energy(CROSS_SPARSE)
    plan0 = spec0.plan({"E": E, "K": K, "N": N},
                       solver="levenberg_marquardt")
    g0 = plan0.compiled.groups[0].group
    assert [d.dim.name for d in g0.ext_domains] == ["K", "E"], \
        "test premise: discovery order is K-first"
    ref = _solve(plan0, {k: np.copy(v) for k, v in inputs.items()})

    spec1 = tl.load_energy(CROSS_SPARSE)
    plan1 = spec1.plan({"E": E, "K": K, "N": N},
                       solver="levenberg_marquardt", use_autoscheduler=1)
    g1 = plan1.compiled.groups[0].group
    assert [d.dim.name for d in g1.ext_domains] == ["E", "K"], \
        "cold-start analytic reorder did not apply"
    out = _solve(plan1, {k: np.copy(v) for k, v in inputs.items()})
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)

    # the mechanical benefit: sorted flattened ids under the new order
    slot1 = next(sl for sl in g1.jac_slots if sl.image.name == "X")
    idx1 = np.asarray(g1._slot_flat_indices(slot1, inputs, use_np=True)
                      ).reshape(-1)
    assert np.all(np.diff(idx1) >= 0)
    slot0 = next(sl for sl in g0.jac_slots if sl.image.name == "X")
    idx0 = np.asarray(g0._slot_flat_indices(slot0, inputs, use_np=True)
                      ).reshape(-1)
    assert not np.all(np.diff(idx0) >= 0)


def test_compute_at_output_chosen_and_rolls():
    """The heuristic CHOOSES compute_at_output (reference autoscheduler
    step 5, thallo.t:5273-5306): inline-JtJp groups whose unknowns' dims
    equal the residual domain get the flag — and on TPU the chosen form
    is what the lowering already produces: every unknown access in such
    a group lowers its transpose to an inverse ROLL (no inverse map, no
    scatter), which is precisely 'iterate over output elements'."""
    spec = tl.load_energy(LAPLACIAN)
    plan = spec.plan({"W": 12, "H": 12}, use_autoscheduler=1)
    flagged = [gp for gp in plan.compiled.groups
               if getattr(gp, "compute_at_output", False)]
    assert flagged, "no group chose compute_at_output"
    for gp in flagged:
        g = gp.group
        for sl in g.uslots:
            assert g._roll_plan(sl) is not None, \
                (gp.name, sl, "flagged group must lower to rolls")
