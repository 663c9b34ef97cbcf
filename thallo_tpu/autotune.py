"""Compile-and-measure schedule search.

The reference's exhaustive autoschedule experiment loop (SURVEY.md §3.5:
the app re-plans with exauto_index = 0,1,2,... and measures each
candidate, logging estimated vs measured cost to schedules.txt,
thallo.t:4221-4251, 5427-5530).  On TPU, per-candidate timing is cheap
once compiled, so this replaces the reference's analytic-model-only
ranking with real measurements (SURVEY.md §7 phase 3 recommendation).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax


def autoschedule_search(
    spec_factory: Callable,
    dim_sizes: Dict[str, int],
    inputs_factory: Callable,
    solver: str = "gauss_newton",
    n_steps: int = 3,
    l_iters: int = 8,
    max_candidates: Optional[int] = None,
    log_path: str = "schedules.txt",
    verbose: bool = True,
):
    """Measure every exhaustive schedule candidate; returns
    (best_plan, results list of (index, schedules, measured_s)).

    The returned best_plan is freshly constructed with the winning
    candidate and already initialized.
    """
    results = []
    idx = 0
    while True:
        if max_candidates is not None and idx >= max_candidates:
            break
        spec = spec_factory()
        try:
            plan = spec.plan(dim_sizes, solver=solver, use_autoscheduler=3 + idx)
        except IndexError:
            break
        plan.set_solver_parameter("nIterations", 10_000)
        plan.set_solver_parameter("lIterations", l_iters)
        plan.init(inputs_factory())
        plan.step()  # compile + warm
        jax.block_until_ready(plan._U)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            plan.step()
        jax.block_until_ready(plan._U)
        dt = (time.perf_counter() - t0) / n_steps
        scheds = [gp.schedule.value for gp in plan.compiled.groups]
        results.append((idx, scheds, dt))
        # estimated vs measured, and feed the measurement back into the
        # heuristic's data store (reference schedules.txt writer
        # thallo.t:4231-4251; ROADMAP #8 "cost model learns from
        # autotune measurements")
        from .schedule import (estimate_group_cost, group_measure_key,
                               record_measurement)

        est = sum(
            estimate_group_cost(gp, gp.schedule, l_iters)[0]
            for gp in plan.compiled.groups
        )
        for gp in plan.compiled.groups:
            record_measurement(group_measure_key(gp, gp.schedule), dt)
        line = (f"measured candidate {idx}: {scheds} -> {dt * 1e3:.3f} ms/step "
                f"(est {est:.3g} bytes/iter)")
        if verbose:
            print(line)
        try:
            with open(log_path, "a") as f:
                f.write(line + "\n")
        except OSError:
            pass
        idx += 1

    if not results:
        raise RuntimeError("no schedule candidates")
    best = min(results, key=lambda r: r[2])
    if verbose:
        print(f"best: candidate {best[0]} {best[1]} ({best[2] * 1e3:.3f} ms/step)")
    spec = spec_factory()
    plan = spec.plan(dim_sizes, solver=solver, use_autoscheduler=3 + best[0])
    plan.init(inputs_factory())
    return plan, results
