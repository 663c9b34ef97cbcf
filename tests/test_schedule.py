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


def test_mode2_clears_to_default():
    spec = tl.load_energy(LAPLACIAN)
    plan = spec.plan({"W": 10, "H": 10}, use_autoscheduler=2)
    assert all(gp.schedule == JTJpSchedule.LINEARIZE for gp in plan.compiled.groups)


def test_autoschedule_search_measures_all():
    """Compile-and-measure exhaustive search (reference's exauto loop)."""
    from thallo_tpu.autotune import autoschedule_search

    def make_inputs():
        return _inputs(10)

    plan, results = autoschedule_search(
        lambda: tl.load_energy(LAPLACIAN),
        {"W": 10, "H": 10},
        make_inputs,
        n_steps=2,
        l_iters=5,
        log_path="/tmp/sched_search.txt",
        verbose=False,
    )
    # exhaustive mode clears directives -> one merged group, 4 candidates
    assert len(results) == 4
    assert all(dt > 0 for _, _, dt in results)
    final = plan.solve()
    assert final > 0
